"""Crash-recovery contract: SIGKILL the pipeline mid-run, rerun with
resume, and verify the final outputs equal a never-crashed run
(FIXTURES.md §4 invariant 5 / SURVEY.md §5 plan item 4)."""

import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from log2seq_spark.session import get_spark
from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
spark = get_spark(master="local[2]", shuffle_partitions=4, app_name="kill-test")
spark.sparkContext.setLogLevel("ERROR")
turns = spark.read.parquet({turns!r})
cfg = PipelineConfig(out_dir={out!r}, n_buckets=4, partitions=4,
                     input_id="kill-test")
print("PIPELINE_STARTING", flush=True)
run_pipeline(spark, turns, cfg, resume=True)
print("PIPELINE_DONE", flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_sigkill_midrun_then_resume(spark, tmpdir_path):
    from log2seq_spark.sources.transcripts import transcripts

    turns_path = os.path.join(tmpdir_path, "turns")
    transcripts(spark, 400, seed=5, partitions=4).write.parquet(turns_path)

    crashed_out = os.path.join(tmpdir_path, "crashed")
    clean_out = os.path.join(tmpdir_path, "clean")

    # start the pipeline in a subprocess and SIGKILL it mid-flight
    snippet = _RUN_SNIPPET.format(repo=REPO, turns=turns_path, out=crashed_out)
    proc = subprocess.Popen([sys.executable, "-c", snippet],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    t0 = time.monotonic()
    started = False
    while time.monotonic() - t0 < 120:
        line = proc.stdout.readline()
        if "PIPELINE_STARTING" in line:
            started = True
            break
    assert started, "pipeline subprocess never started"
    time.sleep(6)  # let it get into the write jobs
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)
    assert proc.returncode != 0

    # nothing was committed OR some buckets were committed; either way the
    # resume rerun must converge to the clean result
    rerun = subprocess.run(
        [sys.executable, "-c",
         _RUN_SNIPPET.format(repo=REPO, turns=turns_path, out=crashed_out)],
        capture_output=True, text=True, timeout=600)
    assert "PIPELINE_DONE" in rerun.stdout, rerun.stderr[-2000:]

    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
    run_pipeline(spark, spark.read.parquet(turns_path),
                 PipelineConfig(out_dir=clean_out, n_buckets=4, partitions=4,
                                input_id="kill-test"),
                 resume=False)

    a = spark.read.parquet(os.path.join(crashed_out, "routed"))
    b = spark.read.parquet(os.path.join(clean_out, "routed"))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    ta = spark.read.parquet(os.path.join(crashed_out, "agg_token_counts"))
    tb = spark.read.parquet(os.path.join(clean_out, "agg_token_counts"))
    assert ta.exceptAll(tb).count() == 0
    assert tb.exceptAll(ta).count() == 0
