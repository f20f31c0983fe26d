"""Multiline log-record assembly: collapse continuation lines (stack
traces, wrapped messages, indented dumps) into the record opened by
their preceding start line.

The standard log-shipper feature (Logstash's multiline codec,
Fluentd's concat filter, Vector's multiline transform — all public
conventions) expressed as pure DataFrame ops: a line opens a record
when it matches ``start_pattern``; every following non-start line in
the same file belongs to that record. The reference parses strictly
line-at-a-time (log2seq __main__.py feeds process_line per line), so
this operator is the pre-pass that turns physical lines into logical
records BEFORE the header cascade — stack-trace bodies stop
quarantining as N parse failures and ride along with their record.

Plan shape: one window running-sum per file assigns record ids (the
classic sessionization trick — no self-join, no UDF), one hash
aggregate builds each record with an ordered in-group sort. Parallelism
unit = file: continuation semantics are inherently sequential WITHIN a
file (the same unit every log shipper uses), so a directory of rotated
logs assembles in parallel while one single multi-TB file would be one
window partition — split such inputs upstream (the logtext source
already yields per-file/per-member rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_multiline(df: DataFrame, start_pattern: str,
                       text_col: str = "text",
                       group_cols: Sequence[str] = ("path", "member"),
                       order_col: str = "line_no",
                       sep: str = "\n") -> DataFrame:
    """→ one row per logical record: ``group_cols`` + ``order_col`` (the
    start line's position), ``n_lines``, ``has_start`` (false for an
    orphan run of continuation lines before the first start line — kept,
    flagged, never silently dropped), and ``text_col`` = the record's
    lines joined with ``sep`` in line order.

    ``start_pattern`` follows ``rlike`` semantics (unanchored — anchor
    with ``^`` yourself, e.g. ``r'^\\d{4}-'`` for timestamp-led records).
    Null text never matches (a null line joins the current record as an
    empty line).
    """
    for tmp in ("__ml_start", "__ml_rid"):
        if tmp in df.columns:
            raise ValueError(f"input frame already has internal column "
                             f"{tmp!r}; rename it before assemble_multiline")
    gcols = list(group_cols)
    w = (Window.partitionBy(*gcols).orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_start = F.coalesce(F.col(text_col).rlike(start_pattern),
                          F.lit(False))
    marked = (df.select(*gcols, order_col, text_col)
                .withColumn("__ml_start", is_start)
                .withColumn("__ml_rid",
                            F.sum(F.col("__ml_start").cast("int")).over(w)))
    line_struct = F.struct(F.col(order_col),
                           F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    return (marked.groupBy(*gcols, "__ml_rid")
                  .agg(F.min(order_col).alias(order_col),
                       F.count(F.lit(1)).alias("n_lines"),
                       F.max("__ml_start").alias("has_start"),
                       F.array_join(
                           F.transform(
                               F.array_sort(F.collect_list(line_struct)),
                               lambda s: s["_t"]),
                           sep).alias(text_col))
                  .drop("__ml_rid"))
