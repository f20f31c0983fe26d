"""Range (interval) join: match fact rows whose timestamp falls inside
keyed time windows — an operator vanilla Spark only expresses as a
non-equi theta join, which the planner executes as BroadcastNestedLoop
(or worse, a cartesian product) and which dies at scale.

Spark-first strategy — granule bucketing: quantize time into fixed
granules, explode each window into the granules it covers (a window of
length L produces ceil(L/granule)+1 rows — bounded, tunable), and
equi-join facts on (keys…, granule). The equi-join shuffles on real
keys, gets AQE/skew handling, broadcast promotion for small window
tables, and codegen — everything the theta join forfeits — and an exact
post-filter on [start, end) restores precise interval semantics. Each
fact carries exactly one granule, so a (fact, window) pair matches at
most once: no dedup pass needed.

At 100 TB: pick ``granule_sec`` close to the typical window length so
window fan-out stays 1–2 rows; the join cost is then the same as a plain
equi-join on (key, time-bucket). Cost is linear in facts + windows, not
facts × windows.

The reference (amulog/log2seq) has no join surface at all — this is a
north-rule addition for telemetry enrichment (match turns/events into
incident / maintenance / alert windows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(facts: DataFrame, windows: DataFrame, *,
               on: Sequence[str],
               fact_ts: str,
               win_start: str,
               win_end: str,
               granule_sec: int = 1800,
               how: str = "inner") -> DataFrame:
    """Join ``facts`` to ``windows`` where ``on`` keys are equal and
    ``win_start <= fact_ts < win_end`` (end-exclusive).

    Both frames keep all their columns (shared join keys appear once).
    ``how`` supports ``inner`` and ``left`` (facts outside every window
    survive with null window columns) — ``left`` adds a second pass over
    the facts via a left-anti composition, still equi-join shaped.
    """
    gran_us = F.lit(int(granule_sec) * 1_000_000)

    def us(col: str) -> Column:
        # accepts TIMESTAMP and TIMESTAMP_NTZ (session tz is UTC)
        return F.unix_micros(F.col(col).cast("timestamp"))

    f = facts.withColumn("_g", (us(fact_ts) / gran_us).cast("bigint"))
    w = windows.withColumn(
        "_g", F.explode(F.sequence(
            (us(win_start) / gran_us).cast("bigint"),
            (us(win_end) / gran_us).cast("bigint"))))
    cond = [*on, "_g"]
    joined = (f.join(w, cond, "inner")
               .filter((F.col(fact_ts) >= F.col(win_start))
                       & (F.col(fact_ts) < F.col(win_end)))
               .drop("_g"))
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        win_cols = [c for c in windows.columns if c not in on]
        # facts whose key never appears in windows OR whose ts missed
        # every window of its key: NULL-SAFE anti-join against matched
        # fact identity — a plain column-list anti-join compares with
        # null-unsafe equality, so any matched fact carrying a NULL in
        # any column also survived as "unmatched" and came back twice.
        # Identical fact rows share one match set (same key, same ts →
        # same windows), so identity-level anti-join preserves input
        # multiplicity exactly.
        fact_cols = facts.columns
        m = matched.select(*fact_cols).distinct().alias("_rjm")
        fa = facts.alias("_rjf")
        acond = None
        for c in fact_cols:
            e = F.col(f"_rjf.{c}").eqNullSafe(F.col(f"_rjm.{c}"))
            acond = e if acond is None else acond & e
        unmatched = fa.join(m, acond, "left_anti")
        for c in win_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(windows.schema[c].dataType))
        return matched.select(*fact_cols, *win_cols).unionByName(
            unmatched.select(*fact_cols, *win_cols))
    raise ValueError(f"unsupported how={how!r}")
