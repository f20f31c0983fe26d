"""Hashed n-gram linear classifier (operators/classifier.py): pure
Python model equality, join-path ≡ expression-path, gram-less docs,
real-weights path, partitioning invariance."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import classifier


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The QUICK quick brown"),
    (3, "single"),
    (4, ""),
    (5, "pack my box with five dozen liquor jugs"),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _md5_60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _pure_classify(rows, dim=1024, seed="clf-v1"):
    out = {}
    for i, t in rows:
        w = [x.lower() for x in t.split() if x]
        grams = [w[j] + "\x1f" + w[j + 1] for j in range(len(w) - 1)]
        ws = []
        for g in grams:
            b = _md5_60(g) % dim
            ws.append(_md5_60(f"{seed}|{b}") / float(1 << 60) - 0.5)
        z = sum(ws) / len(ws) if ws else 0.0
        out[i] = (len(grams), round(1.0 / (1.0 + math.exp(-z)), 6))
    return out


class TestClassifier:
    def test_matches_pure_model(self, spark):
        got = {r["doc_id"]: (r["clf_ngrams"], r["clf_score"])
               for r in classifier.classify(_docs(spark)).collect()}
        want = _pure_classify(CORPUS)
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)

    def test_gramless_docs_score_half(self, spark):
        got = {r["doc_id"]: r for r in
               classifier.classify(_docs(spark)).collect()}
        for d in (3, 4):  # one token / empty: no bigrams
            assert got[d]["clf_ngrams"] == 0
            assert got[d]["clf_score"] == 0.5

    def test_join_path_equals_expression_path(self, spark):
        dim = 64
        # materialize the pseudo model as a real (bucket, weight) table
        wt = spark.range(dim).select(
            F.col("id").alias("bucket"),
            classifier.pseudo_weight(F.col("id"), "clf-v1")
            .alias("weight"))
        docs = _docs(spark)
        a = sorted(map(tuple, classifier.classify(
            docs, dim=dim).collect()))
        b = sorted(map(tuple, classifier.classify(
            docs, dim=dim, weights=wt).collect()))
        assert a == b

    def test_real_weights_missing_buckets_are_zero(self, spark):
        # a weights table covering NO buckets -> z=0 -> score 0.5
        wt = spark.createDataFrame([], "bucket bigint, weight double")
        got = classifier.classify(_docs(spark), weights=wt).collect()
        assert all(r["clf_score"] == 0.5 for r in got)

    def test_partitioning_invariance(self, spark):
        docs = _docs(spark)
        a = sorted(map(tuple, classifier.classify(docs).collect()))
        b = sorted(map(tuple, classifier.classify(
            docs.repartition(7)).collect()))
        assert a == b

    def test_seed_changes_scores(self, spark):
        docs = _docs(spark, [(1, "the quick brown fox jumps")])
        a = classifier.classify(docs, seed="clf-v1").first()["clf_score"]
        b = classifier.classify(docs, seed="other").first()["clf_score"]
        assert a != b


class TestTraining:
    def _labeled(self, spark, n=40, seed=3):
        import random
        rng = random.Random(seed)
        good = ["clear", "helpful", "explains", "carefully", "derives",
                "theorem", "proof", "structured"]
        junk = ["zzz", "spamspam", "clickclick", "garbagegarbage",
                "randomrandom", "noisenoise"]
        rows = []
        for i in range(n):
            vocab = good if i % 2 == 0 else junk
            text = " ".join(rng.choice(vocab) for _ in range(12))
            rows.append((f"d{i:03d}", text, float(1 - i % 2)))
        return spark.createDataFrame(
            rows, "doc_id string, text string, label double")

    def test_separable_set_learns_and_scores(self, spark):
        from log2seq_spark.operators import classifier as clf
        docs = self._labeled(spark)
        w = clf.train_classifier(docs, dim=256, iters=60, lr=20.0)
        assert w.count() <= 256
        scored = (clf.classify(docs, dim=256, weights=w)
                  .join(docs.select("doc_id", "label"), "doc_id"))
        rows = scored.collect()
        good = [r["clf_score"] for r in rows if r["label"] == 1.0]
        bad = [r["clf_score"] for r in rows if r["label"] == 0.0]
        assert min(good) > 0.6 and max(bad) < 0.4

    def test_matches_numpy_reference(self, spark):
        import numpy as np
        from log2seq_spark.operators import classifier as clf
        docs = self._labeled(spark, n=20, seed=7)
        dim, iters, lr = 64, 15, 2.0
        w = {r["bucket"]: r["weight"] for r in
             clf.train_classifier(docs, dim=dim, iters=iters,
                                  lr=lr).collect()}
        feats = clf.doc_features(docs, dim=dim).collect()
        y = {r["doc_id"]: r["label"] for r in docs.collect()}
        ids = sorted(y)
        X = np.zeros((len(ids), dim))
        for r in feats:
            X[ids.index(r["doc_id"]), r["bucket"]] = r["x"]
        yv = np.array([y[i] for i in ids])
        wv = np.zeros(dim)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(X @ wv)))
            wv -= lr * (X.T @ (p - yv)) / len(ids)
        got = np.zeros(dim)
        for b, v in w.items():
            got[b] = v
        assert np.allclose(got, wv, atol=1e-9)

    def test_gramless_docs_ignored(self, spark):
        from log2seq_spark.operators import classifier as clf
        docs = spark.createDataFrame(
            [("a", "solo", 1.0), ("b", "alpha beta", 1.0),
             ("c", "zzz yyy", 0.0)],
            "doc_id string, text string, label double")
        w = clf.train_classifier(docs, dim=32, iters=5)
        # the gram-less doc contributes nothing; training still runs
        assert w.count() >= 1
