"""Structured Streaming variant of the parse→route pipeline."""

from .stream import (streaming_parse, streaming_sink_counts,
                     streaming_tool_latency,
                     streaming_dedup_exact, streaming_dedup_with_index,
                     streaming_route_to_sink,
                     streaming_gated_route,
                     streaming_template_mining, current_templates,
                     streaming_rare_lines,
                     streaming_near_dup_with_index,
                     streaming_clean_corpus,
                     streaming_line_dedup_with_index,
                     streaming_substr_scrub,
                     streaming_ann_ingest,
                     streaming_heavy_hitters, current_heavy_hitters)
from .stateful import conversation_summaries, CONV_SUMMARY_SCHEMA

__all__ = ["streaming_parse", "streaming_sink_counts",
           "streaming_tool_latency",
           "streaming_dedup_exact", "streaming_dedup_with_index",
           "streaming_route_to_sink",
           "streaming_gated_route",
           "streaming_template_mining", "current_templates",
           "streaming_rare_lines",
           "streaming_near_dup_with_index", "streaming_clean_corpus",
           "streaming_line_dedup_with_index",
           "streaming_substr_scrub",
           "streaming_ann_ingest",
           "streaming_heavy_hitters", "current_heavy_hitters",
           "conversation_summaries", "CONV_SUMMARY_SCHEMA"]
