"""Training-shard assembly — the last mile of a training-data pipeline:
a deterministic global shuffle (interleave), fixed-count shard
assignment, per-shard census, the distributed shard write, and
curriculum phase assignment.

Everything is content-addressed through md5 so the shard layout is
reproducible across runs, engines, and cluster sizes (the same posture
as ``operators/sampling.py``), and an ANSI-SQL oracle replays
membership, order boundaries, and phase cuts exactly.

Scale shape: assignment and interleave keys are ONE narrow map-only
projection; the census is one hash aggregate over ``n_shards`` groups
(map-side combinable); the write is one shuffle on the shard id with a
partition-local sort — the same fan-out pattern as the pipeline's
routed sink. Curriculum ranking reuses the distributed prefix sum
(``operators/packing.py``) — never a single-partition global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .packing import with_global_cumsum


def interleave_key(id_col: Column, seed: int = 0) -> Column:
    """Deterministic global-shuffle sort key: md5(seed '#' id) hex.

    Sorting any slice of the corpus by this key interleaves domains /
    sources / conversations uniformly — the property training loaders
    want from a "shuffled" corpus — while staying reproducible and
    engine-portable (same literal md5 in any SQL dialect)."""
    return F.md5(F.concat_ws("#", F.lit(str(seed)), id_col.cast("string")))


def assign_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                  seed: int = 0) -> DataFrame:
    """Add ``shard:int`` (md5-prefix mod ``n_shards``) and
    ``interleave_key:string`` (the within-shard order). Map-only."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    for c in ("shard", "interleave_key"):
        if c in df.columns:
            raise ValueError(f"input already has a {c!r} column")
    key = interleave_key(F.col(id_col), seed)
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
             % F.lit(n_shards)).cast("int")
    return df.withColumn("interleave_key", key).withColumn("shard", shard)


def shard_census(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                 token_col: str | None = None, seed: int = 0) -> DataFrame:
    """Per-shard report ``(shard, n_docs, n_tokens, first_doc,
    last_doc)`` where first/last are the ids at the shard's interleave
    ORDER boundaries (``min_by``/``max_by`` on the interleave key) — so
    a census equality check verifies membership AND the deterministic
    shuffle order, not just counts. ``n_tokens`` is 0-filled when no
    ``token_col`` is given."""
    a = assign_shards(df, n_shards, id_col, seed)
    toks = (F.sum(token_col).cast("bigint") if token_col
            else F.lit(0).cast("bigint"))
    return (a.groupBy("shard")
             .agg(F.count("*").alias("n_docs"),
                  toks.alias("n_tokens"),
                  F.min_by(id_col, "interleave_key").alias("first_doc"),
                  F.max_by(id_col, "interleave_key").alias("last_doc")))


def write_shards(df: DataFrame, path: str, n_shards: int,
                 id_col: str = "doc_id", seed: int = 0,
                 format: str = "parquet") -> None:
    """Write the corpus as ``shard=K`` directories, rows inside each
    shard in interleave order: ONE shuffle on the shard id + a
    partition-local sort (the pipeline's fan-out pattern — one file per
    shard per task, no global sort)."""
    a = assign_shards(df, n_shards, id_col, seed)
    (a.repartition(n_shards, F.col("shard"))
      .sortWithinPartitions("shard", "interleave_key")
      .write.partitionBy("shard").format(format).mode("overwrite")
      .save(path))


def curriculum_phases(df: DataFrame, score_col: str, n_phases: int = 4,
                      id_col: str = "doc_id",
                      ascending: bool = True) -> DataFrame:
    """Add ``phase:int`` in [0, n_phases): equal-rank cuts of the corpus
    ordered by (score, id) — the curriculum schedule (easy → hard when
    ``ascending``). Phase of global rank r (0-based) over n rows is
    ``floor(r * n_phases / n)`` — row_number semantics, replayable in
    any SQL engine without ntile's remainder rules.

    The global rank comes from the distributed prefix sum over a
    composite sortable key — range repartition + partition-local
    windows, never a single-partition sort. Cost: one count + one
    prefix-sum pass."""
    if n_phases < 1:
        raise ValueError("n_phases must be >= 1")
    for c in ("phase", "curriculum_rank"):
        if c in df.columns:
            raise ValueError(f"input already has a {c!r} column")
    n = df.count()
    if n == 0:
        return df.withColumn("phase", F.lit(None).cast("int")) \
                 .withColumn("curriculum_rank", F.lit(None).cast("bigint"))
    # numeric composite ordering (score, id) — negation flips direction
    # without the sign-vs-lexicographic trap of a string key
    score = F.col(score_col).cast("double")
    if not ascending:
        score = -score
    ranked = with_global_cumsum(
        df.withColumn("_cs", score).withColumn("_one", F.lit(1)),
        "_one", ["_cs", id_col], out_col="curriculum_rank")
    phase = F.floor((F.col("curriculum_rank") - 1)
                    * F.lit(n_phases) / F.lit(n)).cast("int")
    return ranked.withColumn("phase", phase).drop("_cs", "_one")


def phase_census(df: DataFrame, score_col: str, n_phases: int = 4,
                 id_col: str = "doc_id", token_col: str | None = None,
                 ascending: bool = True) -> DataFrame:
    """Per-phase report ``(phase, n_docs, n_tokens, first_doc,
    last_doc)`` — first/last are the ids at the phase's curriculum-rank
    boundaries, so the check pins the exact global ordering."""
    p = curriculum_phases(df, score_col, n_phases, id_col, ascending)
    toks = (F.sum(token_col).cast("bigint") if token_col
            else F.lit(0).cast("bigint"))
    return (p.groupBy("phase")
             .agg(F.count("*").alias("n_docs"),
                  toks.alias("n_tokens"),
                  F.min_by(id_col, "curriculum_rank").alias("first_doc"),
                  F.max_by(id_col, "curriculum_rank").alias("last_doc")))
