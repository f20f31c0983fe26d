"""As-of (most-recent-prior) join — the canonical time-series enrichment
Spark's built-ins lack: for each left row, attach the latest right row
whose timestamp is <= the left row's, per key (e.g. each transcript turn
gets the most recent config-change / deploy / purchase event before it).

Spark-first formulation (no range cross-join, no per-row Python): tag
both sides, union, ONE hash-shuffle on the key with a sort on
(ts, side), then carry the right payload forward with
``last(..., ignorenulls=True)`` over the per-key window and keep left
rows. Cost is one shuffle + sort of |L| + |R| rows — the same shape as a
groupBy, so it scales to 100 TB the way a sort-merge join does, where a
range-condition join would explode to |L|×|R| comparisons per key.

Right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
the match is inclusive (right.ts <= left.ts) — the same semantics as
DuckDB/pandas ``ASOF JOIN``, which the driver oracle replays exactly.

Determinism contract: the right side must be unique per (key, ts) —
pre-aggregate it if not (the registered query does) — because window
peers at equal sort keys have no defined order.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload_cols: Optional[List[str]] = None,
              suffix: str = "_asof",
              tolerance_sec: Optional[float] = None) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``<payload><suffix>``
    columns and ``<right_ts><suffix>`` from the latest ``right`` row with
    ``right[right_ts] <= left[left_ts]`` on the same ``on`` key (nulls
    when none). ``tolerance_sec`` voids matches older than the given
    horizon (like pandas ``merge_asof(tolerance=...)``)."""
    on = list(on)
    payload_cols = list(payload_cols or
                        [c for c in right.columns
                         if c not in on and c != right_ts])
    ts_out = f"{right_ts}{suffix}"

    # assert-don't-shadow (the repetition_stats discipline): a left
    # frame already carrying an output or internal name — e.g. the
    # result of a previous asof_join chained with the same suffix —
    # would be silently merged by unionByName, and its STALE payload
    # values would be carried forward as if they were right-side events
    clash = [c for c in ([ts_out, "_ts", "_side", "_stale"]
                         + [f"{c}{suffix}" for c in payload_cols])
             if c in set(left.columns)]
    if clash:
        raise ValueError(
            f"asof_join output/internal columns {clash} already exist "
            "on the left frame; rename them or pass a different suffix")

    # a right row with a NULL timestamp cannot be 'as of' anything —
    # unsorted under nulls-first it would carry its payload into left
    # rows with NO valid right.ts <= left.ts match (a torn row: payload
    # set, ts_out null, and tolerance_sec blind to it)
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(ts_out),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols])
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (Window.partitionBy(*on).orderBy("_ts", "_side"))
    carried = [F.last(c, ignorenulls=True).over(w).alias(c)
               for c in [ts_out] + [f"{c}{suffix}" for c in payload_cols]]
    out = (u.select(*left.columns, "_side", "_ts", *carried)
            .filter(F.col("_side") == 1))
    if tolerance_sec is not None:
        # materialize the flag BEFORE voiding: the predicate reads ts_out,
        # which the voiding itself nulls
        out = out.withColumn(
            "_stale",
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(F.col(ts_out).cast("timestamp"))
            > int(tolerance_sec * 1_000_000))
        for c in [ts_out] + [f"{c}{suffix}" for c in payload_cols]:
            out = out.withColumn(c, F.when(F.col("_stale"), F.lit(None))
                                     .otherwise(F.col(c)))
        out = out.drop("_stale")
    return out.drop("_side", "_ts")
