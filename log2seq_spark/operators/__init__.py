"""Training-data operators: dedup, similarity search, text analysis,
template mining, sequence packing, range/as-of joins, sampling,
multimodal plumbing, PII/URL scrubbing."""

from . import (asof, dedup, multimodal, packing, rangejoin, sampling,
               scrub, similarity, templates, textstats)

__all__ = ["asof", "dedup", "multimodal", "packing", "rangejoin",
           "sampling", "scrub", "similarity", "templates", "textstats"]
