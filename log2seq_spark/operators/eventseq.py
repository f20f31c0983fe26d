"""Event-sequence analytics over keyed, timestamped event streams —
the product/telemetry questions a routed event table answers daily:
"how many users completed view → click → purchase, in order?" (funnel
conversion) and "what does each event type lead to next?" (transition
matrix). Both also read on agent transcripts: tool-call chains are
event sequences keyed by conv_id.

Scale shape (100 TB):

* ``funnel_conversions`` — one ``(key, min_ts)`` aggregate per step,
  each conditioned on the previous step's per-key time via an equi-join
  on the key (steps are few and fixed; #steps shuffles over a frame
  pre-filtered to that step's type, which predicate pushdown prunes at
  the scan). No per-key event list is ever collected, so a key with a
  billion events costs what the aggregates cost.
* ``transition_matrix`` — one lag window per key (one shuffle, per-key
  sort) feeding one (from, to) count aggregate whose key space is
  #types², corpus-size-independent. Probabilities are exact bigint
  counts ratioed at the end.

Everything is built-in expressions — ANSI-replayable, deterministic
tie-breaks (event id) — so DuckDB oracles verify both bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversions(events: DataFrame, steps: Sequence[str],
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel census: for the step sequence ``steps``, count
    keys whose earliest ordered completion reaches each step (step i
    must occur STRICTLY AFTER the key's earliest completion of step
    i-1 — the standard earliest-first funnel, deterministic because
    min() is).

    Returns one row per step: ``(step_idx, step_type, n_converted,
    rate)`` with ``rate`` = n_converted / previous step's count
    (1.0 for step 0), rounded to 6.
    """
    if not steps:
        raise ValueError("funnel_conversions: empty steps")
    k = F.col(key_col)
    reached = None  # (key, _t): earliest completion time of prior step
    counts = []
    for i, st in enumerate(steps):
        ev = events.filter(F.col(type_col) == st) \
                   .select(k.alias("_fk"), F.col(ts_col).alias("_ft"))
        if reached is None:
            cur = ev.groupBy("_fk").agg(F.min("_ft").alias("_t"))
        else:
            cur = (ev.join(reached, "_fk")
                     .filter(F.col("_ft") > F.col("_t"))
                     .groupBy("_fk").agg(F.min("_ft").alias("_t")))
        reached = cur
        counts.append(cur.agg(F.count("*").alias("n")).select(
            F.lit(i).alias("step_idx"), F.lit(st).alias("step_type"),
            F.col("n").cast("long").alias("n_converted")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w = Window.orderBy("step_idx")  # #steps rows — bounded by design
    prev = F.lag("n_converted").over(w)
    rate = (F.when(prev.isNull(), F.lit(1.0))
             .when(prev == 0, F.lit(0.0))
             .otherwise(F.round(F.col("n_converted").cast("double")
                                / prev.cast("double"), 6)))
    return out.select("step_idx", "step_type", "n_converted",
                      rate.alias("rate"))


def transition_matrix(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order transition counts and probabilities between
    consecutive event types within each key's time-ordered stream:
    ``(from_type, to_type, n, p)`` where ``p`` = n / outgoing
    transitions of ``from_type`` (exact bigint ratio rounded to 6).
    ``id_col`` breaks timestamp ties deterministically."""
    w = (Window.partitionBy(key_col)
               .orderBy(F.col(ts_col), F.col(id_col)))
    nxt = F.lead(type_col).over(w)
    pairs = (events.select(F.col(type_col).alias("from_type"),
                           nxt.alias("to_type"))
                   .filter(F.col("to_type").isNotNull()))
    counts = (pairs.groupBy("from_type", "to_type")
                   .agg(F.count("*").cast("long").alias("n")))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n").cast("double") / tot.cast("double"), 6)
         .alias("p"))
