"""Fuzzy (MinHash-LSH) benchmark decontamination: candidates via the
same band machinery as within-corpus near-dup, exact cross-corpus
Jaccard verification on candidates only."""

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import dedup

EVAL = [
    (100, "what is the capital of france paris is the capital"),
    (101, "compute the sum of the first n natural numbers quickly"),
]

TRAIN = [
    # verbatim leak of eval 100
    (0, "what is the capital of france paris is the capital"),
    # light paraphrase of eval 101 (shares most 3-shingles)
    (1, "compute the sum of the first n natural numbers very quickly"),
    # unrelated
    (2, "the quarterly revenue report shows growth in all regions"),
    (3, "stack traces should be collapsed before template mining"),
]


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    return train, ev


class TestFuzzyContamination:
    def test_verbatim_and_paraphrase_caught(self, frames):
        train, ev = frames
        got = {(r["doc_id"], r["eval_id"]): r["jaccard"]
               for r in dedup.fuzzy_contamination(
                   train, ev, threshold=0.5).collect()}
        assert got[(0, 100)] == 1.0
        assert 0.5 <= got[(1, 101)] < 1.0
        assert all(tid in (0, 1) for tid, _ in got)

    def test_threshold_prunes(self, frames):
        train, ev = frames
        got = {r["doc_id"]
               for r in dedup.fuzzy_contamination(
                   train, ev, threshold=0.99).collect()}
        assert got == {0}

    def test_unverified_candidates_superset(self, frames):
        train, ev = frames
        cand = dedup.fuzzy_contamination(train, ev, threshold=0.5,
                                         verify=False)
        rows = cand.collect()
        assert all(r["jaccard"] is None for r in rows)
        cand_pairs = {(r["doc_id"], r["eval_id"]) for r in rows}
        verified = {(r["doc_id"], r["eval_id"])
                    for r in dedup.fuzzy_contamination(
                        train, ev, threshold=0.5).collect()}
        assert verified <= cand_pairs

    def test_plan_shape(self, frames):
        """Eval-side joins broadcast; nothing degenerates to a cross
        join — the train corpus is never self-joined."""
        train, ev = frames
        plan = dedup.fuzzy_contamination(train, ev)._jdf \
            .queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastHashJoin") >= 2

    def test_candidates_match_joint_corpus_buckets(self, spark, frames):
        """A train doc is a candidate iff it shares a band bucket with
        an eval doc in the UNION corpus — the signatures are
        bit-identical across the two entry points."""
        train, ev = frames
        joint = (train.select((F.col("doc_id")).alias("doc_id"), "text")
                 .unionByName(ev.select(
                     (F.col("doc_id")).alias("doc_id"), "text")))
        sig = dedup.minhash_band_signatures(joint)
        pairs = (sig.alias("a").join(sig.alias("b"),
                                     ["band", "band_hash"])
                 .filter((F.col("a._id") < F.lit(100))
                         & (F.col("b._id") >= F.lit(100)))
                 .select(F.col("a._id").alias("t"),
                         F.col("b._id").alias("e")).distinct())
        want = {(r["t"], r["e"]) for r in pairs.collect()}
        got = {(r["doc_id"], r["eval_id"])
               for r in dedup.fuzzy_contamination(
                   train, ev, verify=False).collect()}
        assert got == want
