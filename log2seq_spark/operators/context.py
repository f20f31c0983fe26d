"""Conversation-context assembly over the north-rule transcripts shape
``(conv_id, turn_idx, role, text, …)``: for every turn, gather the
preceding turns of the same conversation that fit a token budget — the
training-sample constructor an LLM pipeline runs to turn raw
multi-turn transcripts into (context, target) pairs.

Semantics: the context of turn *t* is the LONGEST SUFFIX of the up-to-
``max_turns`` turns immediately before *t* whose summed token counts
fit ``max_tokens``. Because token counts are non-negative, "longest
suffix within budget" ≡ "every history element whose suffix-sum fits"
— a pure per-element predicate, so both Spark and an ANSI-SQL oracle
express it with array functions and no iterative fold.

Scale shape (10^12 turns): ONE shuffle — the window partition on
``conv_id`` (the same partitioning the pipeline's salted repartition
already establishes, so in-pipeline composition reuses it). The
history array is bounded by ``max_turns`` (never conversation length):
``collect_list`` over a ``rowsBetween(-max_turns, -1)`` frame, sorted
in-array for determinism. Everything after the window is a narrow
per-row projection of built-in higher-order functions — no Python, no
joins, no corpus-sized state. The suffix-sum predicate is O(max_turns²)
per row on a ≤max_turns array — constant work, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_expr


def assemble_context(turns: DataFrame, *, max_turns: int = 8,
                     max_tokens: int = 512, conv_col: str = "conv_id",
                     idx_col: str = "turn_idx", role_col: str = "role",
                     text_col: str = "text",
                     sep: str = "\n") -> DataFrame:
    """→ ``turns`` + ``n_ctx_turns``, ``ctx_tokens``, ``context_text``
    (chronological ``role: text`` lines joined by ``sep``; empty string
    when no history fits — e.g. every conversation's first turn)."""
    ntok = F.size(tokens_expr(F.col(text_col)))
    w = (Window.partitionBy(conv_col).orderBy(idx_col)
               .rowsBetween(-max_turns, -1))
    # idx first in the struct => array_sort orders chronologically
    hist = F.array_sort(F.collect_list(F.struct(
        F.col(idx_col).alias("_i"), F.col(role_col).alias("_r"),
        F.col(text_col).alias("_t"), ntok.alias("_n"))).over(w))
    staged = turns.withColumn("_hist", hist)
    h = F.col("_hist")
    # keep element i (0-based) iff the suffix starting at it fits the
    # budget — equivalent to the walk-backwards-and-stop fold because
    # token counts are non-negative (suffix sums are non-increasing).
    # Suffix sums come from ONE reversed fold (O(max_turns) interpreted
    # steps per row) instead of an aggregate-over-slice per element
    # (O(max_turns²)); integer addition is associative, so the sums are
    # identical whatever the order — including NULL poisoning: a null
    # token count nulls exactly the suffixes containing it on both
    # formulations, and a null predicate drops the element either way.
    # prepending while folding the REVERSED history yields the suffix
    # sums already in forward index order: after step j the head is
    # the sum of the last j+1 elements
    ss = F.aggregate(
        F.reverse(h), F.array().cast("array<int>"),
        lambda acc, y: F.concat(
            F.array(F.when(F.size(acc) == 0, y["_n"])
                     .otherwise(F.element_at(acc, F.lit(1)) + y["_n"])),
            acc))
    kept = F.transform(
        F.filter(
            F.zip_with(h, ss,
                       lambda x, s: F.struct(x.alias("e"), s.alias("s"))),
            lambda p: p["s"] <= F.lit(max_tokens)),
        lambda p: p["e"])
    out = (staged
           .withColumn("_kept", kept)
           .withColumn("n_ctx_turns", F.size("_kept"))
           .withColumn("ctx_tokens",
                       F.aggregate("_kept", F.lit(0),
                                   lambda acc, y: acc + y["_n"]))
           .withColumn("context_text",
                       F.concat_ws(sep, F.transform(
                           "_kept",
                           lambda x: F.concat(x["_r"], F.lit(": "),
                                              x["_t"]))))
           .drop("_hist", "_kept"))
    return out


def context_digest(ctx: DataFrame, *, conv_col: str = "conv_id",
                   idx_col: str = "turn_idx") -> DataFrame:
    """Per-conversation digest of assembled contexts —
    ``(conv_col, n_turns, total_ctx_tokens, ctx_md5)`` where ``ctx_md5``
    hashes every turn's context in turn order (any assembly error —
    wrong suffix, wrong order, wrong separator — changes it). One
    bounded aggregate; used by tests and the driver oracle row."""
    return (ctx.groupBy(conv_col)
               .agg(F.count("*").alias("n_turns"),
                    F.sum("ctx_tokens").alias("total_ctx_tokens"),
                    F.md5(F.concat_ws(
                        "\x1e",
                        F.transform(
                            F.array_sort(F.collect_list(F.struct(
                                F.col(idx_col).alias("_i"),
                                F.col("context_text").alias("_c")))),
                            lambda x: x["_c"]))).alias("ctx_md5")))
