"""Training-data operators: dedup, similarity search, text analysis,
sequence packing, range/as-of joins, sampling, multimodal plumbing."""

from . import (asof, dedup, multimodal, packing, rangejoin, sampling,
               similarity, textstats)

__all__ = ["asof", "dedup", "multimodal", "packing", "rangejoin",
           "sampling", "similarity", "textstats"]
