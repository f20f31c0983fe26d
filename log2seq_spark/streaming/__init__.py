"""Structured Streaming variant of the parse→route pipeline."""

from .stream import streaming_parse, streaming_sink_counts
from .stateful import conversation_summaries, CONV_SUMMARY_SCHEMA

__all__ = ["streaming_parse", "streaming_sink_counts",
           "conversation_summaries", "CONV_SUMMARY_SCHEMA"]
