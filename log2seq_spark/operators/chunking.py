"""Document chunking: split each document into overlapping
fixed-token-budget windows — the doc-splitting primitive every RAG /
long-context training pipeline runs (distinct from
``operators/packing.py``, which CONCATENATES whole documents into
budget windows; chunking SLICES one document into many).

Window rule (the standard sliding-window-with-overlap): stride =
``chunk_tokens - overlap``; chunk *i* covers tokens
``[i*stride, i*stride + chunk_tokens)``; the last window may be
shorter; a document with no tokens yields no chunks. Deterministic and
closed-form, so an ANSI-SQL oracle replays counts, boundaries, and
token mass exactly.

Scale shape: ONE narrow map pass — tokens via a JVM split, window
starts via ``sequence``, slices via ``transform``+``slice`` (all
higher-order built-ins), then a single ``posexplode``. Fan-out per row
is ``ceil(n_tokens/stride)`` — bounded by document length, no shuffle,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr


def chunk_documents(docs: DataFrame, text_col: str = "text",
                    chunk_tokens: int = 128, overlap: int = 32,
                    id_col: str = "doc_id") -> DataFrame:
    """``(id_col, chunk_idx, n_chunks, chunk_text, n_tokens)`` — one row
    per sliding window of ``chunk_tokens`` whitespace tokens advancing
    by ``chunk_tokens - overlap``. Zero-token documents emit nothing."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    for c in ("chunk_idx", "n_chunks", "chunk_text", "n_tokens"):
        if c in docs.columns:
            raise ValueError(f"input already has a {c!r} column")
    stride = chunk_tokens - overlap
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    # 1 window covers n <= chunk_tokens; each further stride adds one
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            1 + F.ceil((n - F.lit(chunk_tokens))
                       / F.lit(float(stride))).cast("int")))
    # guard BEFORE building the sequence: sequence(0, -1) runs
    # DESCENDING ([0, -1]) for a zero-chunk doc, driving slice() to an
    # invalid 0 start. The n_chunks > 0 filter below does not reliably
    # protect this expression — whether it evaluates first depends on
    # how the optimizer fuses the projection with the filter.
    windows = F.when(
        n_chunks > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.slice(toks, i * stride + 1, chunk_tokens))) \
        .otherwise(F.array().cast("array<array<string>>"))
    staged = (docs.select(F.col(id_col), n_chunks.alias("n_chunks"),
                          windows.alias("__chunks"))
                  .filter(F.col("n_chunks") > 0))
    return (staged.select(
        id_col, "n_chunks",
        F.posexplode("__chunks").alias("chunk_idx", "__w"))
        .select(id_col, "chunk_idx", "n_chunks",
                F.array_join("__w", " ").alias("chunk_text"),
                F.size("__w").alias("n_tokens")))


def chunk_census(docs: DataFrame, text_col: str = "text",
                 chunk_tokens: int = 128, overlap: int = 32,
                 id_col: str = "doc_id") -> DataFrame:
    """Per-chunk-index report ``(chunk_idx, n_docs, n_tokens, first_doc,
    last_doc)`` — how many documents reach window *i* and the token mass
    that window carries corpus-wide. Any off-by-one in the window
    arithmetic moves a count; the id boundaries pin membership.

    Computed CLOSED-FORM from each doc's token count: window *i* of a
    doc with ``n`` tokens carries exactly
    ``least(n - i*stride, chunk_tokens)`` tokens (slices clamp at the
    end), so the census never materializes the overlapping window
    arrays :func:`chunk_documents` builds — that rebuilt ~1.3x the
    corpus's tokens per pass just to take ``size()`` of each window
    (measured 5.9s → 0.6s at sf1.0). ``chunk_documents`` remains the
    text-producing path; a unit test pins census ≡ aggregate over
    chunk_documents."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    for c in ("chunk_idx", "n_chunks", "chunk_text", "n_tokens"):
        if c in docs.columns:
            raise ValueError(f"input already has a {c!r} column")
    stride = chunk_tokens - overlap
    n = F.size(tokens_expr(F.col(text_col)))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            1 + F.ceil((n - F.lit(chunk_tokens))
                       / F.lit(float(stride))).cast("int")))
    staged = (docs.select(F.col(id_col), n.alias("__n"),
                          n_chunks.alias("__nc"))
                  .filter(F.col("__nc") > 0))
    rows = staged.select(
        id_col, "__n",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
         .alias("chunk_idx"))
    ctoks = F.least(F.col("__n") - F.col("chunk_idx") * F.lit(stride),
                    F.lit(chunk_tokens))
    return (rows.groupBy("chunk_idx")
                .agg(F.count("*").alias("n_docs"),
                     F.sum(ctoks).cast("bigint").alias("n_tokens"),
                     F.min(id_col).alias("first_doc"),
                     F.max(id_col).alias("last_doc")))
