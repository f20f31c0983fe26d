"""Round-6 optimization harness (bench.py is FROZEN for measurement;
this file carries the extra per-query instrumentation the optimization
guide §1 asks for: noop-sink isolation, per-query repeats, and
.explain("formatted") dumps).

Usage:
    python bench_extra.py --queries embedding_near_dup,simhash \
        --sf-dir /root/testdata/sf1.0 --passes 2 --plans plans/r06 --tag after

Prints one JSON line with per-query best-of-N seconds. Identical
methodology to bench.py::time_queries (noop sink, full passes over the
list, min per query) so numbers are comparable to the frozen bench.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="all",
                    help="comma list of query names, or 'all'")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip timing")
    args = ap.parse_args()

    from log2seq_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="l2s-bench-extra",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    all_q = entrymod.queries()
    names = list(all_q) if args.queries == "all" else [
        n for n in args.queries.split(",") if n]
    for n in names:
        if n not in all_q:
            raise SystemExit(f"unknown query: {n}")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for n in names:
            df = all_q[n](spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(args.plans, f"{n}_{args.tag}.txt"),
                      "w") as f:
                f.write(txt)

    out: dict = {"sf_dir": args.sf_dir, "cpus": CPUS, "queries": {},
                 "samples": {}}
    if not args.no_time:
        samples: dict[str, list[float]] = {}
        for _ in range(args.passes):
            for n in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{n}")
                t0 = time.monotonic()
                df = all_q[n](spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.setdefault(n, []).append(
                    round(time.monotonic() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        out["queries"] = {n: min(v) for n, v in samples.items()}
        out["samples"] = samples
        out["total_min"] = round(sum(out["queries"].values()), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
