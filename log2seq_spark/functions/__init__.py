"""Vectorized (pandas/Arrow) execution of rule programs + the Spark UDF
bindings."""

from .tokenizer import VectorTokenizer
from .header import VectorHeaderParser
from .parse import BatchParser

__all__ = ["VectorTokenizer", "VectorHeaderParser", "BatchParser"]
