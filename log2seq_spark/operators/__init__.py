"""Training-data operators: dedup, similarity search, text analysis,
template mining, sequence packing, range/as-of joins, sampling,
multimodal plumbing, PII/URL scrubbing, composed corpus cleaning."""

from . import (asof, corpus, dedup, multimodal, packing, rangejoin,
               sampling, scrub, similarity, templates, textstats)

__all__ = ["asof", "corpus", "dedup", "multimodal", "packing",
           "rangejoin", "sampling", "scrub", "similarity", "templates",
           "textstats"]
