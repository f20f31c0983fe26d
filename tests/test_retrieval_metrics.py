"""RRF fusion and ranked-retrieval metrics (recall@k / MRR / nDCG)."""

import math

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import retrieval


def _ranked(spark, rows, cols="doc_id long, score double"):
    return spark.createDataFrame(rows, cols)


class TestRRF:
    def test_fuse_two_lists(self, spark):
        # list A ranks: 1,2,3 ; list B ranks: 3 (id 1), 1 (id 9), 2 (id 2)
        a = _ranked(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
        b = _ranked(spark, [(9, 0.9), (2, 0.8), (1, 0.2)])
        out = {r["doc_id"]: r for r in
               retrieval.rrf_fuse([a, b], k=60).collect()}
        assert out[1]["rrf"] == pytest.approx(1 / 61 + 1 / 63, abs=1e-9)
        assert out[2]["rrf"] == pytest.approx(1 / 62 + 1 / 62, abs=1e-9)
        assert out[9]["rrf"] == pytest.approx(1 / 61, abs=1e-9)
        assert out[9]["n_lists"] == 1 and out[2]["n_lists"] == 2

    def test_rank_not_score_drives_fusion(self, spark):
        # wildly different score scales fuse identically by rank
        a = _ranked(spark, [(1, 1e9), (2, 1.0)])
        b = _ranked(spark, [(1, 0.02), (2, 0.01)])
        out = {r["doc_id"]: r["rrf"] for r in
               retrieval.rrf_fuse([a, b]).collect()}
        assert out[1] == pytest.approx(2 / 61, abs=1e-9)
        assert out[2] == pytest.approx(2 / 62, abs=1e-9)

    def test_per_query_partitioning(self, spark):
        a = spark.createDataFrame(
            [("q1", 1, 2.0), ("q1", 2, 1.0), ("q2", 2, 5.0)],
            "q string, doc_id long, score double")
        out = {(r["q"], r["doc_id"]): r["rrf"] for r in
               retrieval.rrf_fuse([a], query_col="q").collect()}
        assert out[("q1", 2)] == pytest.approx(1 / 62, abs=1e-9)
        assert out[("q2", 2)] == pytest.approx(1 / 61, abs=1e-9)


class TestRetrievalMetrics:
    def test_binary_relevance(self, spark):
        # results ranked 1..4 = ids 10,20,30,40 ; relevant = {20, 40, 50}
        res = _ranked(spark, [(10, 4.0), (20, 3.0), (30, 2.0), (40, 1.0)])
        truth = spark.createDataFrame([(20, 1.0), (40, 1.0), (50, 1.0)],
                                      "doc_id long, rel double")
        m = retrieval.retrieval_metrics(res, truth, k=4).first()
        assert m["n_relevant"] == 3
        assert m["recall_at_k"] == pytest.approx(2 / 3, abs=1e-9)
        assert m["mrr"] == pytest.approx(0.5, abs=1e-9)  # first hit rank 2
        dcg = 1 / math.log2(3) + 1 / math.log2(5)
        idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert m["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-9)

    def test_graded_relevance_and_k_cutoff(self, spark):
        res = _ranked(spark, [(1, 9.0), (2, 8.0), (3, 7.0)])
        truth = spark.createDataFrame([(2, 3.0), (3, 1.0)],
                                      "doc_id long, rel double")
        m = retrieval.retrieval_metrics(res, truth, k=2).first()
        # only ranks 1-2 count: hit = id 2 (rel 3) at rank 2
        assert m["recall_at_k"] == pytest.approx(0.5, abs=1e-9)
        dcg = (2 ** 3 - 1) / math.log2(3)
        idcg = (2 ** 3 - 1) / math.log2(2) + (2 ** 1 - 1) / math.log2(3)
        assert m["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-9)

    def test_no_hits_is_zero_not_null(self, spark):
        res = _ranked(spark, [(1, 1.0)])
        truth = spark.createDataFrame([(99, 1.0)], "doc_id long, rel double")
        m = retrieval.retrieval_metrics(res, truth, k=10).first()
        assert m["recall_at_k"] == 0.0
        assert m["mrr"] == 0.0 and m["ndcg_at_k"] == 0.0

    def test_zero_relevant_query_all_metrics_zero(self, spark):
        # a query with NO relevant rows in truth: every metric is
        # defined as 0.0 and n_relevant as 0 — recall used to come out
        # NULL (missing n_relevant after the left join) while mrr/ndcg
        # were coalesced to 0, inconsistent handling of the same edge
        res = spark.createDataFrame(
            [("a", 1, 2.0), ("b", 2, 2.0)],
            "q string, doc_id long, score double")
        truth = spark.createDataFrame(
            [("a", 1, 1.0), ("b", 9, 0.0)],
            "q string, doc_id long, rel double")
        m = {r["q"]: r for r in retrieval.retrieval_metrics(
            res, truth, k=5, query_col="q").collect()}
        assert m["b"]["n_relevant"] == 0
        assert m["b"]["recall_at_k"] == 0.0
        assert m["b"]["mrr"] == 0.0 and m["b"]["ndcg_at_k"] == 0.0
        assert m["a"]["recall_at_k"] == 1.0  # unaffected query

    def test_per_query(self, spark):
        res = spark.createDataFrame(
            [("a", 1, 2.0), ("a", 2, 1.0), ("b", 3, 2.0)],
            "q string, doc_id long, score double")
        truth = spark.createDataFrame(
            [("a", 2, 1.0), ("b", 3, 1.0), ("b", 4, 1.0)],
            "q string, doc_id long, rel double")
        m = {r["q"]: r for r in retrieval.retrieval_metrics(
            res, truth, k=2, query_col="q").collect()}
        assert m["a"]["mrr"] == pytest.approx(0.5)
        assert m["b"]["recall_at_k"] == pytest.approx(0.5)
        assert m["b"]["mrr"] == 1.0
