"""SparkSession helper with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "log2seq-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Local-mode session sized to the host; on a real cluster the same
    conf keys are supplied via spark-submit instead."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # under spark-submit (PythonRunner exports the gateway port) the
    # master/deploy conf comes from the submit command line; setting
    # .master() here would silently override --master, so don't
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and under_submit:
        b = SparkSession.builder.appName(app_name)
    else:
        b = SparkSession.builder.appName(app_name).master(
            master or f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or cpus
    b = (b
         # scale shuffle width with cores; AQE coalesces the tail
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         # Arrow everywhere; batch size pinned so N- and 4N-core runs do
         # identical per-batch work (BASELINE.md protocol)
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.session.timeZone", "UTC")
         # local-mode driver IS the executor: an 8g default heap GC-thrashes
         # at ≥16 busy threads (measured 1.5× wall); size for the box
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "40g")))
    # shuffle/spill dirs on tmpfs when available: models per-node NVMe
    # scratch (the sandbox's virtual disk serializes shuffle I/O)
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
