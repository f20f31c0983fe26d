"""BM25 retrieval (operators/retrieval.py): hand-computed scores on a
tiny corpus, ranking sanity, tie-break determinism, partitioning
invariance, and the filtered-explode scale contract."""

import math

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import retrieval


CORPUS = [
    (1, "the quick brown fox jumps"),
    (2, "the quick quick dog"),
    (3, "brown bears eat fish"),
    (4, "lorem ipsum dolor sit amet consectetur"),
    (5, ""),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _pure_bm25(rows, query, k1=1.2, b=0.75):
    toks = {i: [w.lower() for w in t.split() if w] for i, t in rows}
    q = sorted({w.lower() for w in query.split() if w})
    n = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in q}
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in q:
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if s > 0:
            out[i] = round(s, 6)
    return out


class TestBM25:
    def test_scores_match_pure_model(self, spark):
        docs = _docs(spark)
        got = {r["doc_id"]: r["score"] for r in
               retrieval.bm25_scores(docs, "quick brown").collect()}
        want = _pure_bm25(CORPUS, "quick brown")
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6)

    def test_ranking_and_topk(self, spark):
        docs = _docs(spark)
        top = retrieval.bm25_topk(docs, "quick", topk=2).collect()
        # doc 2 has tf=2 for 'quick' and is shorter -> ranks first
        assert [r["doc_id"] for r in top] == [2, 1]

    def test_tiebreak_deterministic(self, spark):
        docs = _docs(spark, [(7, "alpha beta"), (3, "alpha beta"),
                             (9, "gamma delta")])
        top = retrieval.bm25_topk(docs, "alpha", topk=2).collect()
        assert [r["doc_id"] for r in top] == [3, 7]  # equal score, id asc

    def test_partitioning_invariance(self, spark):
        docs = _docs(spark)
        a = sorted(map(tuple,
                       retrieval.bm25_scores(docs, "the fox").collect()))
        b = sorted(map(tuple, retrieval.bm25_scores(
            docs.repartition(5), "the fox").collect()))
        assert a == b

    def test_query_term_case_and_dedup(self, spark):
        docs = _docs(spark)
        a = sorted(map(tuple,
                       retrieval.bm25_scores(docs, "Quick QUICK").collect()))
        b = sorted(map(tuple,
                       retrieval.bm25_scores(docs, "quick").collect()))
        assert a == b

    def test_empty_query_raises(self, spark):
        with pytest.raises(ValueError):
            retrieval.bm25_scores(_docs(spark), "   ")

    def test_no_match_returns_empty(self, spark):
        assert retrieval.bm25_scores(
            _docs(spark), "zzzznothere").count() == 0
