"""Interleaved A/B of the pipeline aggregate feed (round-4 verdict item):

  A = agg_from_flags=True  — read-back consumes the routed sink's
      precomputed ok/fail/empty boolean columns
  B = agg_from_flags=False — read-back re-derives the flags from the
      message/error/rule_id columns (pre-v2 path)

Runs A,B,A,B,... on the same input (fresh out_dir per run, warmup run
first) so host clock drift hits both arms equally. Prints one JSON line
with per-arm total walls + phase walls.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import CPUS, BENCH_TURNS, ensure_turns, cpu_calibration
    from log2seq_spark.session import get_spark
    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline

    reps = int(os.environ.get("AB_REPS", 3))
    spark = get_spark(master=f"local[{CPUS}]")
    turns_path = ensure_turns(spark, BENCH_TURNS)
    turns = spark.read.parquet(turns_path)
    n = turns.count()
    out_dir = os.path.join(os.path.dirname(turns_path), "ab_out")

    def run(flags: bool) -> dict:
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = PipelineConfig(out_dir=out_dir, n_buckets=64,
                             partitions=CPUS * 2, input_id=turns_path,
                             agg_from_flags=flags)
        t0 = time.monotonic()
        res = run_pipeline(spark, turns, cfg, resume=False)
        wall = round(time.monotonic() - t0, 3)
        return {"wall": wall,
                "route": res.metrics.get("wall_route_s"),
                "agg": res.metrics.get("wall_agg_s")}

    run(True)          # warmup (JVM/JIT/python workers)
    calib0 = cpu_calibration()
    arms: dict[str, list[dict]] = {"flags": [], "legacy": []}
    for _ in range(reps):
        arms["flags"].append(run(True))
        arms["legacy"].append(run(False))
    calib1 = cpu_calibration()

    summary = {
        arm: {
            "wall_min": min(r["wall"] for r in rs),
            "agg_min": min(r["agg"] for r in rs),
            "route_min": min(r["route"] for r in rs),
            "samples": rs,
        } for arm, rs in arms.items()
    }
    print(json.dumps({"rows": n, "cpus": CPUS, "reps": reps,
                      "calib": [calib0, calib1], "arms": summary}))


if __name__ == "__main__":
    main()
