"""Sink backend seam: ``parquet`` / ``orc`` (always available) or
``iceberg`` (when the Iceberg Spark runtime jar + a catalog are on the
session).

SURVEY §6 / BASELINE.md promise an ``iceberg | parquet`` sink
abstraction with identical partition layout and manifest semantics.
The seam is this module: the pipeline writes through
:func:`write_partitioned`, which picks the physical writer. The
partition columns, dynamic-overwrite healing semantics, and the
pipeline's own manifest.jsonl commit protocol are the same either way —
Iceberg adds snapshot isolation on top, it does not replace the
lineage manifest.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

BACKENDS = ("parquet", "orc", "iceberg", "auto")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def resolve_backend(spark: SparkSession, backend: str = "auto") -> str:
    """'auto' → iceberg when its runtime is present, else parquet.
    Requesting iceberg explicitly without the runtime is an error (not a
    silent downgrade)."""
    if backend not in BACKENDS:
        raise ValueError(f"unknown sink backend {backend!r}; "
                         f"expected one of {BACKENDS}")
    if backend == "auto":
        return "iceberg" if iceberg_available(spark) else "parquet"
    if backend == "iceberg" and not iceberg_available(spark):
        raise RuntimeError(
            "sink backend 'iceberg' requested but the Iceberg Spark "
            "runtime jar is not on the classpath (add "
            "org.apache.iceberg:iceberg-spark-runtime and a catalog conf)")
    return backend


def write_partitioned(df: DataFrame, dest: str,
                      partition_cols: List[str],
                      backend: str = "parquet",
                      iceberg_table: Optional[str] = None) -> None:
    """Partitioned overwrite write through the selected backend.

    parquet: dynamic partition overwrite to ``dest`` (a path). The mode
    is set per-writer, never on the session conf, so unrelated writes in
    the same session keep their own semantics.

    iceberg: dynamic ``overwritePartitions`` into ``iceberg_table`` (a
    catalog table identifier; ``dest`` is ignored), creating the
    partitioned table on first write.
    """
    spark = df.sparkSession
    backend = resolve_backend(spark, backend)
    if backend == "iceberg":
        table = iceberg_table or _path_to_table(dest)
        if spark.catalog.tableExists(table):
            # dynamic overwrite of only the partitions present in df;
            # NEVER createOrReplace an existing table — a transient
            # commit failure must surface, not silently drop the
            # previously committed partitions
            df.writeTo(table).overwritePartitions()
        else:
            from pyspark.sql import functions as F
            (df.writeTo(table).using("iceberg")
               .partitionedBy(*[F.col(c) for c in partition_cols])
               .create())
        return
    writer = (df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_cols))
    if backend == "orc":
        writer.orc(dest)
    else:
        writer.parquet(dest)


def read_partitioned(spark: SparkSession, dest: str,
                     backend: str = "parquet",
                     iceberg_table: Optional[str] = None) -> DataFrame:
    """Read back what :func:`write_partitioned` wrote, through the same
    backend seam (iceberg reads the catalog table, parquet the path)."""
    backend = resolve_backend(spark, backend)
    if backend == "iceberg":
        return spark.table(iceberg_table or _path_to_table(dest))
    if backend == "orc":
        return spark.read.orc(dest)
    return spark.read.parquet(dest)


def has_data_files(spark: SparkSession, dest: str,
                   backend: str = "parquet",
                   iceberg_table: Optional[str] = None) -> bool:
    """True when :func:`write_partitioned` left at least one data file
    under ``dest`` (iceberg: when the table exists).

    Positive emptiness detection for the pipeline read-back: a
    partitioned write of zero rows leaves no footers, so schema
    inference on the read-back raises AnalysisException — but so do
    genuinely broken states (resuming an out_dir with a different
    backend, corrupt footers). The pipeline must tell these apart by
    probing, never by treating any analysis failure as "empty".
    Listing goes through the Hadoop FileSystem API so it works on
    whatever filesystem the path lives on, not just local disk."""
    backend = resolve_backend(spark, backend)
    if backend == "iceberg":
        return spark.catalog.tableExists(iceberg_table or _path_to_table(dest))
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    it = fs.listFiles(path, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


def _path_to_table(dest: str) -> str:
    """Fallback table identifier for an iceberg write given a path-style
    dest: last two path components as namespace.table."""
    parts = [p for p in dest.replace("\\", "/").split("/") if p]
    return ".".join(parts[-2:]) if len(parts) >= 2 else parts[-1]
