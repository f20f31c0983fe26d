"""10x scale soak: run the flagship pipeline ONCE at ~12M turns (about
10x the bench's 1.16M-row sf0.1 workload) on local[N] and report wall,
throughput, shuffle spill, and peak task memory from the Spark status
REST API. Validates that the chunk-salted repartition and the
persist-based aggregate pass survive memory pressure the small bench
cannot create.

Usage:  python tools/soak.py [n_turns]      (default 12_000_000)

Prints one JSON line:
    {"n_rows": ..., "wall_s": ..., "turns_per_sec": ...,
     "memory_spill_mb": ..., "disk_spill_mb": ..., "peak_exec_mem_mb": ...,
     "calib_lines_per_sec": [...], "cpus": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import cpu_calibration, ensure_turns, CPUS, DATA_DIR, MEAN_CONV_LEN


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=10) as r:
        return json.load(r)


def spill_stats(spark) -> dict:
    """Sum spill + max peak execution memory over all completed stages."""
    stages = _rest(spark, "/stages?status=complete")
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    peak = max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
    return {"memory_spill_mb": round(mem / 2**20, 1),
            "disk_spill_mb": round(disk / 2**20, 1),
            "peak_exec_mem_mb": round(peak / 2**20, 1),
            "n_stages": len(stages)}


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    from log2seq_spark.session import get_spark
    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
    spark = get_spark(app_name="log2seq-spark-soak",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        calib0 = cpu_calibration()
        turns_path = ensure_turns(spark, n_turns)
        out_dir = os.path.join(DATA_DIR, "soak_out")
        shutil.rmtree(out_dir, ignore_errors=True)
        turns = spark.read.parquet(turns_path)
        n = turns.count()
        cfg = PipelineConfig(out_dir=out_dir, n_buckets=64,
                             partitions=CPUS * 2, input_id=turns_path)
        t0 = time.monotonic()
        res = run_pipeline(spark, turns, cfg, resume=False)
        wall = time.monotonic() - t0
        calib1 = cpu_calibration()
        line = {"n_rows": n, "wall_s": round(wall, 1),
                "turns_per_sec": round(n / wall, 1),
                "n_ok": res.metrics["n_ok"], "n_fail": res.metrics["n_fail"],
                **spill_stats(spark),
                "calib_lines_per_sec": [calib0, calib1], "cpus": CPUS}
        print(json.dumps(line))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
