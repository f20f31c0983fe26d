"""Training-data operators: dedup, similarity search, text analysis,
template mining, sequence packing, range/as-of joins, sampling,
multimodal plumbing."""

from . import (asof, dedup, multimodal, packing, rangejoin, sampling,
               similarity, templates, textstats)

__all__ = ["asof", "dedup", "multimodal", "packing", "rangejoin",
           "sampling", "similarity", "templates", "textstats"]
