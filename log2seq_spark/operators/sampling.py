"""Deterministic sampling operators for training-data pipelines.

Hash-based (content-addressed) sampling: membership depends only on
``(seed, id)`` through md5, so a sample is reproducible across runs,
engines, and cluster sizes — no RNG state, no per-partition seeds, and
an ANSI-SQL oracle replays membership exactly (unlike ``df.sample``,
whose RNG is engine- and partitioning-dependent).

Scale shape: a narrow projection + filter evaluated at the scan — no
shuffle, no state; stratified rates are a literal CASE over the strata
column.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 0) -> Column:
    """Stable bucket in [0, 10000) from md5(seed '#' id).

    Uses 8 hex chars (2^32 values): 4 chars (65536 values) taken mod
    10000 had severe modulo bias — buckets 0-5535 were 7/6 as likely as
    the rest, so every sampling rate silently over-selected by up to
    ~6.8% relative. At 2^32 the residual bias is ~2e-6."""
    key = F.md5(F.concat_ws("#", F.lit(str(seed)), id_col.cast("string")))
    return (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
            % F.lit(N_BUCKETS)).cast("int")


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """Keep a deterministic ``rate`` fraction keyed by ``id_col``."""
    thr = int(round(rate * N_BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), seed) < F.lit(thr))


def leakage_safe_split(df: DataFrame, clusters: DataFrame | None = None,
                       *, val_rate: float = 0.05, id_col: str = "doc_id",
                       cluster_id_col: str = "cluster_id",
                       seed: int = 0) -> DataFrame:
    """Train/val assignment where near-duplicate families never straddle
    the split — ``df`` + ``split:string`` ('train' | 'val').

    Membership hashes the duplicate-**cluster** id (``clusters`` =
    ``(id_col, cluster_id_col)``, e.g. :func:`..dedup.duplicate_clusters`
    output), falling back to the doc's own id for unclustered docs: a
    near-duplicate of a validation document can never land in train, so
    eval contamination is impossible by construction rather than by
    audit. With ``clusters=None`` this degrades to a plain
    content-addressed split (same membership as :func:`hash_sample`).

    Scale shape: one left join against the cluster map (only docs that
    appear in near-dup pairs — a small fraction of the corpus, typically
    broadcast-able; AQE picks) + a map-side hash. No extra shuffle of
    the corpus itself."""
    thr = int(round(val_rate * N_BUCKETS))
    if clusters is not None:
        cl = clusters.select(F.col(id_col).alias("__sid"),
                             F.col(cluster_id_col).cast("string")
                              .alias("__sgrp"))
        df = df.join(cl, df[id_col] == cl["__sid"], "left").drop("__sid")
        group = F.coalesce(F.col("__sgrp"), F.col(id_col).cast("string"))
    else:
        group = F.col(id_col).cast("string")
    split = (F.when(hash_bucket(group, seed) < F.lit(thr), "val")
              .otherwise("train"))
    out = df.withColumn("split", split)
    return out.drop("__sgrp") if clusters is not None else out


def stratified_sample(df: DataFrame, strata_col: str, rates: Dict[str, float],
                      default_rate: float = 0.0, id_col: str = "doc_id",
                      seed: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language- or
    source-balanced training mixes): each stratum keeps its own rate of
    rows, selected by the same content-addressed bucket."""
    thr: Column = F.lit(int(round(default_rate * N_BUCKETS)))
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(int(round(rate * N_BUCKETS)))
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    thr = thr if expr is None else expr.otherwise(thr)
    return df.filter(hash_bucket(F.col(id_col), seed) < thr)


def md5_uniform(id_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform in (0,1) from ``md5(seed '#' id)``: 13 hex
    chars are 52 bits — exactly a double's mantissa, so the conversion
    is exact in any engine — and the +0.5 offset keeps u strictly
    inside (0,1) (``ln(0)`` downstream would be -inf)."""
    key = F.md5(F.concat_ws("#", F.lit(str(seed)), id_col.cast("string")))
    return ((F.conv(F.substring(key, 1, 13), 16, 10).cast("double")
             + F.lit(0.5)) / F.lit(float(16 ** 13)))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row draws the content-addressed uniform ``u = md5_uniform(seed,
    id)`` and the k rows with the largest ``u^(1/w)`` are the sample —
    inclusion probability proportional to weight, reproducible across
    runs, engines, partitionings and cluster sizes because there is no
    RNG state to diverge.

    Ranked by the monotone-equivalent ``ln(u)/w`` DESCENDING (avoids
    pow underflow for large weights). Rows with NULL or non-positive
    weight are excluded — zero weight means "never sample".

    Cross-engine determinism: ``ln`` is a libm call with no
    bit-exactness guarantee — measured on this rig, ~20% of values
    differ in the last ulp between the JVM (fdlibm, <=1 ulp) and
    glibc (correctly rounded), so a near-tie at the rank-k boundary
    can select different rows on different engines. The key is
    therefore rounded to 9 decimals (a grid ~1e8x coarser than the
    drift; Spark and DuckDB ``round`` verified bit-identical over
    390k+ probe values incl. negatives) before ranking; grid ties
    resolve identically everywhere via the ``id_col`` tie-break.

    WEIGHT-MAGNITUDE BOUND: the absolute 9-decimal grid assumes keys
    of roughly |ln(u)/w| >= ~1e-6, i.e. weights up to ~1e6. For
    w >> 1e7 every key collapses onto a handful of grid values and the
    ascending ``id_col`` tie-break dominates — the "weighted" sample
    silently degenerates toward lowest-id rows. Rescale such weights
    (divide by their max; inclusion probabilities are scale-invariant)
    before calling, or sample on the unrounded key if cross-engine
    replay is not needed.

    Scale shape: a narrow map-side key + ``orderBy().limit(k)``, which
    plans TakeOrderedAndProject (per-partition heap + k-row merge) —
    no global sort, no shuffle beyond the k-row collect."""
    u = md5_uniform(F.col(id_col), seed)
    w = F.col(weight_col).cast("double")
    return (df.filter(w > 0)
              .withColumn("_es_key", F.round(F.log(u) / w, 9))
              .orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
              .limit(k)
              .drop("_es_key"))
