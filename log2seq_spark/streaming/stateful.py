"""Custom stateful streaming operator: conversation assembly.

The reference has no streaming at all; this is the north-rule-native
"custom stateful operator" slot: group the parsed turn stream by
``conv_id``, keep running per-conversation aggregates in Spark's state
store via ``applyInPandasWithState`` (Arrow-batched, not per-row), and
emit one summary row per conversation once its event-time watermark
expires (no new turns for the timeout window).

At scale this is the canonical sessionization shape: state is
partitioned by the group key across executors, the watermark bounds
state size, and late turns within the watermark still fold in.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

CONV_SUMMARY_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("n_ok", LongType()),
    StructField("n_tokens", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("last_ts", TimestampType()),
    StructField("max_turn_idx", IntegerType()),
])

_STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("n_ok", LongType()),
    StructField("n_tokens", LongType()),
    StructField("first_ts_us", LongType()),
    StructField("last_ts_us", LongType()),
    StructField("max_turn_idx", IntegerType()),
])


_DURATION_MS = {"millisecond": 1, "second": 1000, "minute": 60_000,
                "hour": 3_600_000, "day": 86_400_000}


def duration_ms(spec: str) -> int:
    """Parse a Spark-style interval string like '30 minutes', '1 hour'
    or the compound form '1 hour 30 minutes' — any spec ``withWatermark``
    accepts must parse here too, or a caller tuning the watermark from
    Spark docs crashes at plan construction."""
    toks = spec.strip().split()
    if not toks or len(toks) % 2:
        raise ValueError(
            f"cannot parse interval {spec!r}: expected 'N unit "
            "[N unit ...]' (e.g. '30 minutes', '1 hour 30 minutes')")
    total = 0
    for n, unit in zip(toks[::2], toks[1::2]):
        try:
            total += int(n) * _DURATION_MS[unit.rstrip("s").lower()]
        except (ValueError, KeyError):
            raise ValueError(
                f"cannot parse interval {spec!r}: bad component "
                f"{n!r} {unit!r}") from None
    return total


def _make_assemble(timeout_ms: int):
    """Bind the conversation-close gap (event-time ms) into the stateful
    function — the same duration as the stream watermark, so the session
    timeout and the late-data bound always agree."""

    def _assemble(key: Tuple[str], frames: Iterable[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n_turns, n_ok, n_tokens, first_us, last_us, max_idx = state.get
            state.remove()
            yield pd.DataFrame({
                "conv_id": [key[0]], "n_turns": [n_turns], "n_ok": [n_ok],
                "n_tokens": [n_tokens],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "max_turn_idx": [max_idx]})
            return

        n_turns, n_ok, n_tokens, first_us, last_us, max_idx = (
            state.get if state.exists else (0, 0, 0, None, None, -1))
        for pdf in frames:
            n_turns += len(pdf)
            n_ok += int(pdf["message"].notna().sum())
            n_tokens += int(pdf["n_words"].fillna(0).sum())
            ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_ok, n_tokens, first_us, last_us, max_idx))
        # close the conversation when no turn arrives for timeout_ms of
        # event time
        state.setTimeoutTimestamp(last_us // 1000 + timeout_ms)
        yield pd.DataFrame(columns=[f.name for f in
                                    CONV_SUMMARY_SCHEMA.fields])

    return _assemble


def conversation_summaries(parsed_stream: DataFrame,
                           watermark: str = "30 minutes") -> DataFrame:
    """Parsed turn stream → per-conversation summary rows emitted on
    event-time timeout. Input needs conv_id, turn_idx, ts and the parsed
    struct. The conversation-close gap equals ``watermark`` (one knob:
    the state timeout and the late-data bound stay in lockstep)."""
    turns = (parsed_stream
             .withWatermark("ts", watermark)
             .select("conv_id", "turn_idx", "ts",
                     F.col("parsed.message").alias("message"),
                     F.coalesce(F.size("parsed.words"), F.lit(0))
                      .alias("n_words")))
    return (turns.groupBy("conv_id")
                 .applyInPandasWithState(
                     _make_assemble(duration_ms(watermark)),
                     CONV_SUMMARY_SCHEMA, _STATE_SCHEMA,
                     "append", GroupStateTimeout.EventTimeTimeout))
