"""Two-parallelism scaling pair for the ExactSubstr batch scrub
(same methodology as tools/bench_scaling.py: interleaved fresh-JVM
samples at local[N] and local[4N] on the IDENTICAL parquet input,
best-of walls, N=2 by default to stay under this box's per-core
throttle knee). One JSON line to stdout; fold into BENCH/DELTAS.md.

Usage:
    python tools/scaling_substr.py              # orchestrate
    python tools/scaling_substr.py --run 2      # one sample (internal)
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/tmp/substr_scaling"
N_DOCS = int(os.environ.get("SPARK_GRAFT_SUBSTR_DOCS", 1_000_000))
CORES_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", 2))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", 3))


def _gen(spark):
    from tools.soak_substr import shard_docs
    src = f"{DATA}/docs"
    if not os.path.exists(f"{src}/_SUCCESS"):
        shard_docs(spark, 0, N_DOCS).write.mode("overwrite").parquet(src)
    return src


def one_sample(cores: int) -> float:
    from log2seq_spark.operators.substrdedup import scrub_duplicate_spans
    from log2seq_spark.session import get_spark
    spark = get_spark(master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    src = _gen(spark)
    docs = spark.read.parquet(src)
    out = f"{DATA}/out{cores}"

    def run():
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        scrub_duplicate_spans(docs, k=8).write.mode("overwrite") \
                                        .parquet(out)
        return time.time() - t0

    run()                      # warmup (JIT + python workers)
    w = run()
    spark.stop()
    return w


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print(json.dumps({"wall": one_sample(int(sys.argv[2]))}))
        return
    # generate once in a throwaway session so samples never pay it
    from log2seq_spark.session import get_spark
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    _gen(spark)
    spark.stop()
    lo, hi = CORES_N, CORES_N * 4
    walls = {lo: [], hi: []}
    for r in range(ROUNDS):
        for cores in (lo, hi) if r % 2 == 0 else (hi, lo):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run", str(cores)],
                capture_output=True, text=True, cwd=REPO)
            w = json.loads(p.stdout.strip().splitlines()[-1])["wall"]
            walls[cores].append(round(w, 2))
            print(f"# local[{cores}] sample {r}: {w:.2f}s",
                  file=sys.stderr)
    best_lo, best_hi = min(walls[lo]), min(walls[hi])
    print(json.dumps({
        "metric": "substr batch scrub scaling", "n_docs": N_DOCS,
        "cores": [lo, hi], "walls_s": walls,
        "speedup": round(best_lo / best_hi, 3),
        "efficiency": round(best_lo / best_hi / (hi / lo), 3)}))


if __name__ == "__main__":
    main()
