"""Training-data operators: dedup, similarity search, text analysis,
template mining, template-anomaly surfaces (drift/rarity/bursts),
sequence packing, range/as-of joins, sampling, multimodal plumbing,
PII/URL scrubbing, composed corpus cleaning."""

from . import (anomaly, asof, bloom, chunking, corpus, dedup,
               expectations, funnel, layout, mixture, multimodal, packing,
               preference, rangejoin, sampling, scrub, shards, similarity,
               substrdedup, templates, textstats)

__all__ = ["anomaly", "asof", "bloom", "chunking", "corpus", "dedup",
           "expectations", "funnel", "layout", "mixture", "multimodal",
           "packing", "preference", "rangejoin", "sampling", "scrub",
           "shards", "similarity", "substrdedup", "templates",
           "textstats"]
