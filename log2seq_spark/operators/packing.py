"""Sequence packing for LLM training batches: assign documents, in a
deterministic global order, to fixed token-budget chunks (context
windows) by running token count.

The core primitive is a DISTRIBUTED PREFIX SUM. A naive window
``sum() over (order by id)`` with no partition key collapses the whole
table into one sorted partition — a non-starter at scale. Instead:

1. range-repartition by the ordering key (Spark samples split points, so
   partitions are ordered AND balanced);
2. within each partition, a cumulative window keyed by
   ``spark_partition_id()`` (parallel, partition-local sort only);
3. per-partition totals (one tiny aggregate — #partitions rows) are
   collected, their exclusive prefix computed driver-side, and joined
   back as a broadcast map.

global_cumsum = partition_offset + local_cumsum. Every step is one
narrow pass; nothing serializes onto a single task. The assignment rule
is "contiguous fill": a document whose preceding documents total ``c``
tokens starts chunk ``floor(c / budget)`` — the standard concat-and-slice
packing used for pretraining batches (documents may straddle a boundary;
the chunk id is where the document STARTS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def with_global_cumsum(df: DataFrame, value_col: str,
                       order_col: str | list[str],
                       out_col: str = "cumsum",
                       num_partitions: int | None = None) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` in ``order_col`` order
    (a column name or a list for composite ordering), without a global
    single-partition sort (see module docstring)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    order_cols = ([order_col] if isinstance(order_col, str)
                  else list(order_col))
    # checkpoint pins the range layout: RangePartitioner SAMPLES split
    # points with a per-RDD seed, so re-executing the plan (the totals
    # job vs the final job) could otherwise assign different _pids and
    # corrupt the offsets; materializing also makes the input pass run
    # once instead of twice
    part = (df.repartitionByRange(n, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())
    w = (Window.partitionBy("_pid").orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = part.withColumn("_local", F.sum(value_col).over(w))
    totals = (local.groupBy("_pid")
                   .agg(F.sum(value_col).alias("_tot"))
                   .collect())  # one row per partition — driver-side tiny
    offsets = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_tot"] or 0
    # offsets enter the plan as a literal map: no join, no shuffle.
    # The empty fallback must be TYPED — a bare create_map() is
    # map<void,void>, and omap[_pid] fails analysis on an empty input
    # frame (any upstream filter yielding zero rows crashed here)
    omap = (F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
            if offsets else
            F.create_map().cast("map<int,bigint>"))
    return (local.withColumn(out_col,
                             F.col("_local")
                             + F.coalesce(omap[F.col("_pid")], F.lit(0)))
                 .drop("_pid", "_local"))


def pack_sequences(docs: DataFrame, token_col: str, order_col: str,
                   budget: int = 4096) -> DataFrame:
    """Add ``chunk_id``: the training context window each document starts
    in under contiguous-fill packing at ``budget`` tokens per chunk."""
    c = with_global_cumsum(docs, token_col, order_col)
    start = F.col("cumsum") - F.col(token_col)
    return c.withColumn("chunk_id",
                        F.floor(start / F.lit(budget)).cast("bigint"))


def chunk_summary(docs: DataFrame, token_col: str, order_col: str,
                  budget: int = 4096) -> DataFrame:
    """Per-chunk packing report: documents starting in the chunk, their
    token mass, and the first/last doc ids — what a batch-builder reads."""
    packed = pack_sequences(docs, token_col, order_col, budget)
    return (packed.groupBy("chunk_id")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum(token_col).alias("n_tokens"),
                       F.min(order_col).alias("first_doc"),
                       F.max(order_col).alias("last_doc")))
