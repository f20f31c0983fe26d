"""Explicit skew handling for shuffle joins — the hot-key tool the
pipeline's salted repartition (``plans/pipeline.py``) applies to
sorting, generalized to equi-joins.

When one side of an equi-join is heavily skewed (a handful of conv_ids
/ hosts / templates carry most rows) and the other side is too big to
broadcast, a plain shuffle join lands every hot key's rows on ONE
reducer: the stage runs at the speed of its worst key. AQE's skew-join
splitter (``spark.sql.adaptive.skewJoin``) handles the sort-merge case
at runtime; :func:`salted_join` is the explicit, planner-independent
form — it also covers hash joins and lets the caller pick the fan-out:

* the skewed (probe) side gets a deterministic per-row salt in
  ``[0, n_salt)`` — hashed from the whole row, NOT the key, so one hot
  key spreads across ``n_salt`` reducers;
* the build side replicates each row ``n_salt`` times (an ``explode``
  of a literal range — n_salt× the build side's bytes, the explicit
  price of the spread);
* the join runs on ``(key…, salt)`` and the salt column never escapes.

Row multiplicity is exactly that of the unsalted join (each skewed row
carries ONE salt; the build row exists once per salt value), so the
result is verifiably identical — asserted against the plain join in
tests.

:func:`key_skew_stats` is the sizing helper: per-key counts + the
max/mean skew factor, the number that says whether salting (or a
bigger ``n_salt``) is worth the replication cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_join(skewed: DataFrame, build: DataFrame, on,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``skewed ⋈ build`` on columns ``on`` (str or list),
    spreading each join key over ``n_salt`` reducers. ``how`` supports
    ``inner`` and ``left`` (outer semantics on the build side would
    need per-salt dedup — use the plain join there). Output columns
    match ``skewed.join(build, on, how)`` exactly."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    for side, cols in (("skewed", skewed.columns), ("build", build.columns)):
        if _SALT in cols:
            raise ValueError(f"{side} side already has a {_SALT} column")
    # whole-row hash, not key hash: rows of one hot key must scatter
    salted = skewed.withColumn(
        _SALT, F.pmod(F.hash(F.struct(*skewed.columns)), F.lit(n_salt)))
    replicated = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return (salted.join(replicated, keys + [_SALT], how)
                  .drop(_SALT))


def key_skew_stats(df: DataFrame, key, top: int = 20,
                   round_to: int | None = 2) -> DataFrame:
    """Per-key row counts for the ``top`` heaviest keys, each with its
    ``skew_factor`` = count / mean-count-per-key — the "do I need to
    salt, and how wide" number. One aggregate + a bounded sort-limit;
    the mean joins back as a broadcast 1-row frame (a global window
    here would single-partition the whole distinct-key table).
    ``round_to=None`` keeps the raw IEEE ratio (exactly reproducible
    across engines; half-up rounding of binary doubles is not)."""
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    mean = counts.agg(F.avg("n").alias("_mean"))
    factor = F.col("n") / F.col("_mean")
    if round_to is not None:
        factor = F.round(factor, round_to)
    return (counts.crossJoin(F.broadcast(mean))
                  .withColumn("skew_factor", factor)
                  .drop("_mean")
                  .orderBy(F.desc("n"), *keys)
                  .limit(top))
