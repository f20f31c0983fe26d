"""The north rule's launch protocol: spark-submit --py-files with the
package zip as the ONLY source of log2seq_spark (cwd outside the repo,
PYTHONPATH scrubbed), driving the full pipeline to exit 0."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_pipeline(spark, tmpdir_path):
    sys.path.insert(0, REPO)
    from tools.build_pyfiles import build
    from log2seq_spark.sources.transcripts import write_transcripts

    zip_path = build(os.path.join(tmpdir_path, "log2seq_spark.zip"))
    stub = os.path.join(tmpdir_path, "submit.py")
    shutil.copy(os.path.join(REPO, "tools", "submit.py"), stub)
    inp = os.path.join(tmpdir_path, "turns")
    out = os.path.join(tmpdir_path, "pipe")
    write_transcripts(spark, inp, 40, seed=3)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         stub, "pipeline", "--input", inp, "--out", out, "--buckets", "4"],
        cwd=tmpdir_path, env=env, capture_output=True, text=True,
        timeout=360)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # PythonRunner remaps the python app's stderr onto spark-submit's
    # stdout, so the summary line may appear on either stream
    assert "lineage=" in proc.stdout + proc.stderr
    n = spark.read.parquet(os.path.join(out, "routed")).count()
    assert n == spark.read.parquet(inp).count()
