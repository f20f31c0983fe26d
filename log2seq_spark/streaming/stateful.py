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
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

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


# --- streaming multiline record assembly --------------------------------

MULTILINE_RECORD_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("line_no", LongType()),
    StructField("n_lines", LongType()),
    StructField("has_start", BooleanType()),
    StructField("flushed", BooleanType()),
    StructField("text", StringType()),
])

_ML_STATE_SCHEMA = StructType([
    StructField("line_no", LongType()),
    StructField("n_lines", LongType()),
    StructField("has_start", BooleanType()),
    StructField("buf", StringType()),
])


def _make_multiline(start_pattern: str, text_col: str, order_col: str,
                    sep: str, flush_ms: int):
    import re
    start_re = re.compile(start_pattern)

    def _fn(key, frames: Iterable[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MULTILINE_RECORD_SCHEMA.fields]

        def rows(recs, flushed):
            return pd.DataFrame(
                [(key[0], ln, n, hs, flushed, txt)
                 for ln, n, hs, txt in recs], columns=cols)

        if state.hasTimedOut:
            ln, n, hs, buf = state.get
            state.remove()
            yield rows([(ln, n, hs, buf)], flushed=True)
            return

        dfs = [f for f in frames if len(f)]
        if not dfs:
            # data-less invocation: keep the open record, refresh the
            # idle-flush clock
            if state.exists:
                state.setTimeoutDuration(flush_ms)
            yield rows([], flushed=False)
            return
        pdf = pd.concat(dfs, ignore_index=True)
        pdf = pdf.sort_values(order_col, kind="stable")
        texts = pdf[text_col].fillna("")
        # vectorized record segmentation within the batch: cumsum of
        # start flags; rid 0 continues the carried open record
        is_start = texts.map(lambda t: start_re.search(t) is not None)
        rid = is_start.cumsum()

        carried = state.get if state.exists else None
        done = []
        open_rec = None
        for r, grp in pdf.groupby(rid.values, sort=True):
            g_texts = texts.loc[grp.index]
            body = sep.join(g_texts)
            first_ln = int(grp[order_col].iloc[0])
            n = len(grp)
            if r == 0:
                if carried is not None:
                    c_ln, c_n, c_hs, c_buf = carried
                    rec = (c_ln, c_n + n, c_hs, c_buf + sep + body)
                else:
                    rec = (first_ln, n, False, body)   # orphan head
            else:
                rec = (first_ln, n, True, body)
            if open_rec is not None:
                done.append(open_rec)
            open_rec = rec
        if open_rec is None:                 # empty batch frames
            open_rec = carried
        elif rid.max() == 0 and carried is not None:
            pass                             # merged above; stays open
        if carried is not None and rid.max() > 0 and 0 not in rid.values:
            # batch began with a start line: the carried record is done
            done.insert(0, carried)
        if open_rec is not None:
            state.update(tuple(open_rec))
            state.setTimeoutDuration(flush_ms)
        else:
            if state.exists:
                state.remove()
        yield rows(done, flushed=False)

    return _fn


def streaming_assemble_multiline(lines: DataFrame, start_pattern: str,
                                 text_col: str = "text",
                                 group_col: str = "path",
                                 order_col: str = "line_no",
                                 sep: str = "\n",
                                 flush: str = "30 seconds") -> DataFrame:
    """Streaming twin of
    :func:`log2seq_spark.operators.multiline.assemble_multiline` — the
    missing half of a tail-follow log shipper: ``logtail`` emits
    physical lines as they are appended; this operator reassembles
    logical records ACROSS micro-batch boundaries, keeping at most one
    open record per file in Spark's state store
    (``applyInPandasWithState`` — Arrow-batched, checkpointed, so a
    restart resumes with the open record intact).

    A record emits as soon as the line OPENING THE NEXT record arrives
    (``flushed=false``), or when its file goes idle for ``flush`` of
    processing time (``flushed=true`` — the Logstash
    ``auto_flush_interval`` semantic: a continuation line arriving
    after the flush starts a new ``has_start=false`` orphan record
    rather than mutating emitted history).

    Requires per-file line order across batches — exactly what
    ``logtail`` provides (appends are read sequentially; ``line_no``
    is monotonic per path). State size: one open record per active
    file, independent of stream volume.

    Drain semantics: an ``availableNow`` run with a pending idle flush
    stays alive until the flush fires (Spark schedules an extra batch
    at the timeout deadline), and ``processAllAvailable`` blocks on
    that pending batch too. For drain-and-exit jobs either use a short
    ``flush``, or poll ``recentProgress`` for a zero-input entry (the
    data is committed) and ``stop()`` — the open records then flush on
    the NEXT run.
    """
    keyed = lines.select(F.col(group_col).alias("path"),
                         F.col(order_col).alias("line_no"),
                         F.col(text_col).alias("text"))
    return (keyed.groupBy("path")
                 .applyInPandasWithState(
                     _make_multiline(start_pattern, "text", "line_no",
                                     sep, duration_ms(flush)),
                     MULTILINE_RECORD_SCHEMA, _ML_STATE_SCHEMA,
                     "append", GroupStateTimeout.ProcessingTimeTimeout))
