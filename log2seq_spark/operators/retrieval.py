"""BM25 keyword retrieval over a document corpus (Robertson & Walker's
Okapi BM25, with the Lucene-style non-negative idf — the standard
sparse-retrieval baseline a training-data pipeline uses for corpus
search, nearest-neighbor sanity checks, and retrieval-augmented data
curation).

Scale shape (100 TB): the ONLY corpus-scale work is one tokenize +
filter-to-query-terms projection — the per-doc token array is filtered
to the (tiny) query vocabulary BEFORE the explode, so the exploded
frame carries at most |query| rows per matching document, not the
corpus token count. Document frequency and corpus stats are then
aggregates over that already-tiny frame (df has ≤ |query| rows) and
broadcast back; the final top-k is an ``orderBy().limit()`` which
compiles to TakeOrdered (per-partition heap + k-row merge), never a
global sort shuffle. All built-in functions — ANSI-SQL-expressible, so
a DuckDB oracle replays scores exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr


def _lower_tokens(text_col):
    return F.transform(tokens_expr(text_col), lambda t: F.lower(t))


def bm25_scores(docs: DataFrame, query: str, *, id_col: str = "doc_id",
                text_col: str = "text", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """Per-document BM25 score for ``query``: ``(id_col, score)``, one
    row per document matching ≥1 query term (non-matching documents
    score 0 and are omitted — at corpus scale that is almost all of
    them, and emitting them would be a full-corpus result).

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N-df+0.5)/(df+0.5))`` (Lucene's shifted
    idf, never negative). Scores are rounded to 6 places so the DuckDB
    oracle replay is hash-stable.
    """
    qterms = sorted({t.lower() for t in query.split() if t})
    if not qterms:
        raise ValueError("bm25: empty query")
    toks = _lower_tokens(F.col(text_col))
    # stats over the whole corpus: one 1-row aggregate, broadcast back
    staged = docs.select(F.col(id_col).alias("_bm_id"), toks.alias("_w"))
    stats = staged.agg(F.count("*").alias("_n"),
                       F.avg(F.size("_w")).alias("_avgdl"))
    # filter the token array to query terms BEFORE exploding: the
    # exploded frame is ≤ |query| distinct terms per matching doc
    matched = staged.select(
        "_bm_id", F.size("_w").alias("_dl"),
        F.explode(F.filter("_w", lambda t: t.isin(qterms))).alias("_term"))
    tf = (matched.groupBy("_bm_id", "_dl", "_term")
                 .agg(F.count("*").alias("_tf")))
    dfq = tf.groupBy("_term").agg(F.count("*").alias("_df"))
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5))
    per_term = (tf.join(F.broadcast(dfq), "_term")
                  .crossJoin(F.broadcast(stats))
                  .select("_bm_id",
                          (idf * F.col("_tf") * (k1 + 1.0)
                           / (F.col("_tf") + k1 * (1.0 - b
                              + b * F.col("_dl") / F.col("_avgdl"))))
                          .alias("_s")))
    return (per_term.groupBy("_bm_id")
                    .agg(F.round(F.sum("_s"), 6).alias("score"))
                    .select(F.col("_bm_id").alias(id_col), "score"))


def bm25_topk(docs: DataFrame, query: str, *, id_col: str = "doc_id",
              text_col: str = "text", k1: float = 1.2, b: float = 0.75,
              topk: int = 10) -> DataFrame:
    """Top-k documents for ``query`` by BM25 — ``(id_col, score)``,
    deterministic tie-break on id. TakeOrdered plan: no global sort."""
    scored = bm25_scores(docs, query, id_col=id_col, text_col=text_col,
                         k1=k1, b=b)
    return scored.orderBy(F.col("score").desc(),
                          F.col(id_col).asc()).limit(topk)
