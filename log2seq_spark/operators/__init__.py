"""Training-data operators: dedup, similarity search, text analysis,
multimodal plumbing."""

from . import dedup, similarity, textstats

__all__ = ["dedup", "similarity", "textstats"]
