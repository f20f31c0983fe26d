"""Structured Streaming variant of the parse→route pipeline."""

from .stream import streaming_parse, streaming_sink_counts

__all__ = ["streaming_parse", "streaming_sink_counts"]
