"""Preference-pair construction (DPO/RLHF-style) from transcript turns:
group assistant responses that answer the SAME prompt (digit-masked
text of the immediately preceding turn), then pair the best- and
worst-scoring responses per prompt as (chosen, rejected).

Scoring is pluggable (pass ``score_col``); the default is the
whitespace-token count of the response — a deterministic stand-in for
a reward model that still exercises the full pair-construction shape
(rank, tie-break, margin gate).

Scale shape: ONE window over ``conv_id`` (lag to fetch the prompt; the
same partitioning every other conversation operator uses) + ONE window
over ``prompt_key`` (two row_numbers, opposite orders — rank state
only). No self-join: a prompt with *n* candidate responses costs *n*
rows, not *n²* pairs, because only rank-1 from each end is kept.
Tie-breaks are total (score, then response md5), so the pairing is
deterministic under any partitioning and an ANSI-SQL oracle replays it
row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

# digit-masking fingerprint shared with agentqa's loop/boilerplate
# detectors: prompts differing only in ids/counters are the same prompt
MASK_PATTERN = r"[0-9]+"


def candidate_responses(turns: DataFrame, *,
                        role_col: str = "role",
                        text_col: str = "text",
                        assistant_role: str = "assistant",
                        score_col: str | None = None) -> DataFrame:
    """Assistant turns annotated with their prompt key and score:
    ``(prompt_key, conv_id, turn_idx, response, score, resp_md5)``.

    ``prompt_key`` = md5 of the digit-masked text of the immediately
    preceding turn in the conversation (first turns have no prompt and
    are dropped). ``score`` = ``score_col`` if given, else the
    whitespace-token count of the response."""
    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_text = F.lag(text_col).over(w)
    score: Column = (F.col(score_col).cast("double") if score_col
                     else F.size(tokens_expr(F.col(text_col)))
                            .cast("double"))
    return (turns
            .withColumn("__prev", prev_text)
            .filter((F.col(role_col) == assistant_role)
                    & F.col("__prev").isNotNull())
            .select(
                F.md5(F.regexp_replace(F.col("__prev"),
                                       MASK_PATTERN, "<*>"))
                 .alias("prompt_key"),
                "conv_id", "turn_idx",
                F.col(text_col).alias("response"),
                score.alias("score"),
                F.md5(text_col).alias("resp_md5")))


def preference_pairs(turns: DataFrame, *,
                     margin: float = 0.0,
                     role_col: str = "role",
                     text_col: str = "text",
                     assistant_role: str = "assistant",
                     score_col: str | None = None) -> DataFrame:
    """One (chosen, rejected) pair per prompt with ≥2 distinct-scored
    candidates and a score gap ≥ ``margin``:

    ``(prompt_key, n_candidates, chosen_conv_id, chosen_turn_idx,
    chosen_md5, rejected_conv_id, rejected_turn_idx, rejected_md5,
    gap)``.

    Chosen = max (score, resp_md5, conv_id, turn_idx); rejected = min —
    the md5/id tie-break makes both ends unique and deterministic.
    Pairs where chosen and rejected are the same physical turn (single
    candidate) or the same text (exact-dup responses with gap 0) are
    gated out by the margin/identity checks.
    """
    from pyspark.sql import Window
    cand = candidate_responses(
        turns, role_col=role_col, text_col=text_col,
        assistant_role=assistant_role, score_col=score_col)
    order = [F.col("score"), F.col("resp_md5"),
             F.col("conv_id"), F.col("turn_idx")]
    wk = Window.partitionBy("prompt_key")
    top = Window.partitionBy("prompt_key").orderBy(
        *[c.desc() for c in order])
    bot = Window.partitionBy("prompt_key").orderBy(
        *[c.asc() for c in order])
    ranked = cand.select(
        "*",
        F.row_number().over(top).alias("__rt"),
        F.row_number().over(bot).alias("__rb"),
        F.count("*").over(wk).alias("n_candidates"))
    ends = ranked.filter((F.col("__rt") == 1) | (F.col("__rb") == 1))
    chosen = ends.filter(F.col("__rt") == 1).select(
        "prompt_key", "n_candidates",
        F.col("conv_id").alias("chosen_conv_id"),
        F.col("turn_idx").alias("chosen_turn_idx"),
        F.col("resp_md5").alias("chosen_md5"),
        F.col("score").alias("__cs"))
    rejected = ends.filter(F.col("__rb") == 1).select(
        "prompt_key",
        F.col("conv_id").alias("rejected_conv_id"),
        F.col("turn_idx").alias("rejected_turn_idx"),
        F.col("resp_md5").alias("rejected_md5"),
        F.col("score").alias("__rs"))
    return (chosen.join(rejected, "prompt_key")
            .withColumn("gap", F.col("__cs") - F.col("__rs"))
            .filter((F.col("n_candidates") >= 2)
                    & (F.col("gap") >= F.lit(float(margin)))
                    & ((F.col("chosen_conv_id")
                        != F.col("rejected_conv_id"))
                       | (F.col("chosen_turn_idx")
                          != F.col("rejected_turn_idx"))))
            .select("prompt_key", "n_candidates",
                    "chosen_conv_id", "chosen_turn_idx", "chosen_md5",
                    "rejected_conv_id", "rejected_turn_idx",
                    "rejected_md5", "gap"))
