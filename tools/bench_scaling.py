"""Two-parallelism scaling evidence (BASELINE.json north rule).

No multi-node cluster exists in this sandbox, so the N vs 4N
executor-cluster criterion is evidenced by running the IDENTICAL
parse→enrich→route→aggregate job at ``local[N]`` and ``local[4N]``
(default N=4; the driver instruction allows any N vs 4N pair — this box
throttles per-core clocks beyond ~16 busy cores, so 8→32 measures the
hardware's own sublinearity, not the job's: a pure-CPU multiprocessing
regex benchmark scales only 3.18×/0.79 from 8→32 procs here) on the
same cached input (BASELINE.md protocol). Each run is
a fresh subprocess (own JVM), Arrow batch size pinned, generation
excluded from timing. Results + efficiency go to ``BENCH/scaling.json``
and are summarized in ``BENCH/BASELINE.md``.

Usage:
    python tools/bench_scaling.py              # orchestrate both runs
    python tools/bench_scaling.py --run 8      # one measured run (internal)
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

DATA_DIR = os.path.join(REPO, ".data")
BENCH_DIR = os.path.join(REPO, "BENCH")
N_TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", 3_000_000))
CORES_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", 4))
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", 3))


def _turns_path() -> str:
    n_convs = max(200, N_TURNS // 82)
    return os.path.join(DATA_DIR, f"bench_turns_{n_convs}")


def measured_run(cores: int) -> None:
    from log2seq_spark.session import get_spark
    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline

    spark = get_spark(app_name=f"l2s-scaling-{cores}",
                      master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    turns = spark.read.parquet(_turns_path())
    n = turns.count()
    secs = []
    for i in range(REPEATS):
        out_dir = os.path.join(DATA_DIR, f"scaling_out_{cores}")
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = PipelineConfig(out_dir=out_dir, n_buckets=64,
                             partitions=cores * 2, input_id="scaling")
        t0 = time.monotonic()
        run_pipeline(spark, turns, cfg, resume=False)
        secs.append(time.monotonic() - t0)
    spark.stop()
    med = sorted(secs)[len(secs) // 2]
    print(json.dumps({"cores": cores, "rows": n, "runs_sec": secs,
                      "median_sec": med,
                      "turns_per_sec": round(n / med, 1)}))


def orchestrate() -> None:
    # generate input once (excluded from timing)
    from log2seq_spark.session import get_spark
    from log2seq_spark.sources.transcripts import write_transcripts
    path = _turns_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(app_name="l2s-scaling-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        write_transcripts(spark, path, max(200, N_TURNS // 82), seed=42,
                          partitions=64)
        spark.stop()

    results = {}
    for cores in (CORES_N, CORES_N * 4):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores)],
            capture_output=True, text=True, cwd=REPO)
        line = [x for x in out.stdout.splitlines() if x.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    thr_n = results[CORES_N]["turns_per_sec"]
    thr_4n = results[CORES_N * 4]["turns_per_sec"]
    eff = (thr_4n / thr_n) / 4
    summary = {"n": results[CORES_N], "4n": results[CORES_N * 4],
               "scaling_efficiency": round(eff, 3),
               "criterion": f"(thr[local{CORES_N*4}]/thr[local{CORES_N}])/4 >= 0.8"}
    os.makedirs(BENCH_DIR, exist_ok=True)
    with open(os.path.join(BENCH_DIR, "scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        measured_run(int(sys.argv[2]))
    else:
        orchestrate()
