"""Bloom-filter semi-join prefiltering (operators/bloom.py).

The contract under test: NO false negatives ever (the property the
exact-result guarantee of bloom_contamination_report rests on), false
positives near the configured rate, both probe shapes (plan-literal
expression vs broadcast join) agree everywhere, and the expression
probe stays a map-only Filter — zero Exchange in its plan.
"""

import random

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import bloom, dedup


def _member_words(n, seed=7):
    rng = random.Random(seed)
    return [f"tok{rng.randrange(10 ** 9)}_{i}" for i in range(n)]


class TestParameters:
    def test_sizing_math(self):
        m, k = bloom.bloom_parameters(1000, 0.01)
        # canonical 1% sizing: ~9.59 bits/key, 7 hashes
        assert 9000 <= m <= 10240 and m % 64 == 0
        assert k == 7

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            bloom.bloom_parameters(0, 0.01)
        with pytest.raises(ValueError):
            bloom.bloom_parameters(10, 1.5)


class TestBuildAndProbe:
    def test_no_false_negatives_expr(self, spark):
        members = _member_words(500)
        df = spark.createDataFrame([(w,) for w in members], "v string")
        filt = bloom.build_bloom(df, "v", n_items=len(members), fpp=0.01)
        n_in = df.where(bloom.might_contain_expr("v", filt)).count()
        assert n_in == len(members)

    def test_fpr_near_configured(self, spark):
        members = _member_words(500, seed=1)
        df = spark.createDataFrame([(w,) for w in members], "v string")
        filt = bloom.build_bloom(df, "v", n_items=len(members), fpp=0.01)
        probes = spark.createDataFrame(
            [(f"absent_{i}",) for i in range(4000)], "v string")
        fp = probes.where(bloom.might_contain_expr("v", filt)).count()
        assert fp / 4000 < 0.05          # 1% nominal, generous margin

    def test_null_probe_is_false_and_nulls_skipped_in_build(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
        filt = bloom.build_bloom(df, "v", n_items=2, fpp=0.01)
        got = (df.select(bloom.might_contain_expr("v", filt).alias("m"),
                         "v").collect())
        by_v = {r["v"]: r["m"] for r in got}
        assert by_v["a"] and by_v["b"] and by_v[None] is not True

    def test_join_probe_agrees_with_expr_probe(self, spark):
        members = _member_words(300, seed=2)
        mdf = spark.createDataFrame([(w,) for w in members], "v string")
        filt = bloom.build_bloom(mdf, "v", n_items=len(members), fpp=0.02)
        probes = spark.createDataFrame(
            [(w,) for w in members[:150]]
            + [(f"nope_{i}",) for i in range(500)] + [(None,)],
            "v string")
        via_expr = probes.withColumn(
            "m", bloom.might_contain_expr("v", filt))
        words_df = bloom.bloom_words_df(spark, filt)
        via_join = bloom.might_contain_join(
            probes, "v", words_df, filt["m_bits"], filt["k"], out_col="m")
        # None sorts first via the ("" if null) key; probe verdict for a
        # null value must be falsy on both paths
        key = lambda r: (r["v"] or "", bool(r["m"]))
        a = sorted((key(r) for r in via_expr.collect()))
        b = sorted((key(r) for r in via_join.collect()))
        assert a == b

    def test_expr_probe_plan_is_map_only(self, spark):
        members = _member_words(100, seed=3)
        df = spark.createDataFrame([(w,) for w in members], "v string")
        filt = bloom.build_bloom(df, "v", n_items=len(members))
        plan = (df.where(bloom.might_contain_expr("v", filt))
                  ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "getbit" in plan.lower()

    def test_oversized_literal_refused(self, spark):
        filt = {"words": [0] * ((bloom.MAX_EXPR_BITS // 64) + 64),
                "m_bits": bloom.MAX_EXPR_BITS + 64 * 64, "k": 3}
        with pytest.raises(ValueError, match="might_contain_join"):
            bloom.might_contain_expr("v", filt)


class TestBloomContamination:
    def _docs(self, spark):
        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(60)]
        rows = []
        for i in range(120):
            text = " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(4, 30)))
            rows.append((i, text))
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    @pytest.mark.parametrize("broadcast_confirm", [True, False])
    def test_equals_exact_contamination_report(self, spark,
                                               broadcast_confirm):
        docs = self._docs(spark)
        evalset = docs.where(F.col("doc_id") % 10 == 0)
        train = docs.where(F.col("doc_id") % 10 != 0)
        exact = dedup.contamination_report(train, evalset, threshold=0.5)
        via_bloom = bloom.bloom_contamination_report(
            train, evalset, threshold=0.5, fpp=0.01,
            broadcast_confirm=broadcast_confirm)
        rows = lambda df: sorted(
            [r["doc_id"], r["n_shingles"], r["n_overlap"],
             float(r["overlap_ratio"]), r["contaminated"]]
            for r in df.collect())
        a, b = rows(exact), rows(via_bloom)
        assert a == b and len(a) > 0

    def test_undersized_n_items_still_exact(self, spark):
        # a bad size estimate degrades FPR, never correctness
        docs = self._docs(spark)
        evalset = docs.where(F.col("doc_id") % 10 == 0)
        train = docs.where(F.col("doc_id") % 10 != 0)
        exact = dedup.contamination_report(train, evalset, threshold=0.5)
        tiny = bloom.bloom_contamination_report(
            train, evalset, threshold=0.5, fpp=0.01, n_items=4)
        rows = lambda df: sorted(
            [r["doc_id"], r["n_shingles"], r["n_overlap"]]
            for r in df.collect())
        assert rows(exact) == rows(tiny)


class TestPersistAndMerge:
    def test_save_load_roundtrip(self, spark, tmpdir_path):
        import os
        members = _member_words(200, seed=5)
        df = spark.createDataFrame([(w,) for w in members], "v string")
        filt = bloom.build_bloom(df, "v", n_items=len(members), fpp=0.01)
        p = os.path.join(tmpdir_path, "bf")
        bloom.save_bloom(spark, filt, p)
        back = bloom.load_bloom(spark, p)
        assert back == filt

    def test_merge_is_union(self, spark):
        a_words = _member_words(150, seed=6)
        b_words = _member_words(150, seed=7)
        m, k = bloom.bloom_parameters(300, 0.01)
        mk = dict(m_bits=m, k=k)
        da = spark.createDataFrame([(w,) for w in a_words], "v string")
        db = spark.createDataFrame([(w,) for w in b_words], "v string")
        fa = bloom.build_bloom(da, "v", **mk)
        fb = bloom.build_bloom(db, "v", **mk)
        merged = bloom.merge_blooms(fa, fb)
        probes = spark.createDataFrame(
            [(w,) for w in a_words + b_words], "v string")
        n = probes.where(bloom.might_contain_expr("v", merged)).count()
        assert n == len(a_words) + len(b_words)   # no false negatives
        # merged filter == filter built over the union (same params)
        both = bloom.build_bloom(da.union(db), "v", **mk)
        assert merged["words"] == both["words"]

    def test_merge_rejects_mismatched_params(self):
        with pytest.raises(ValueError, match="different"):
            bloom.merge_blooms({"words": [0], "m_bits": 64, "k": 3},
                               {"words": [0, 0], "m_bits": 128, "k": 3})


class TestIndexBloomShortCircuit:
    """dedup_against_index(index_bloom=...): the probe may only ever
    REROUTE rows around the join, never change a decision."""

    def _corpus(self, spark, seed, n, vocab):
        rng = random.Random(seed)
        rows = [(i, f"content {rng.randrange(vocab)}") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_decisions_equal_plain_join(self, spark):
        hist = self._corpus(spark, 1, 60, 20)
        batch = self._corpus(spark, 2, 40, 30)
        idx = dedup.exact_dedup_index(hist)
        filt = bloom.build_bloom(idx, "text_hash", fpp=0.01, n_items=64)
        plain = {r["doc_id"]: (r["decision"], r["keep_id"])
                 for r in dedup.dedup_against_index(batch, idx).collect()}
        via = {r["doc_id"]: (r["decision"], r["keep_id"])
               for r in dedup.dedup_against_index(
                   batch, idx, index_bloom=filt).collect()}
        assert via == plain
        assert "drop_seen" in {d for d, _ in plain.values()}  # non-trivial

    def test_superset_bloom_still_exact(self, spark):
        # a sidecar carrying hashes the index no longer has (the
        # crash-window over-approximation) must not change decisions
        hist = self._corpus(spark, 3, 50, 15)
        extra = self._corpus(spark, 4, 50, 500)     # mostly novel
        batch = self._corpus(spark, 5, 40, 25)
        idx = dedup.exact_dedup_index(hist)
        superset = bloom.build_bloom(
            dedup.exact_dedup_index(hist.unionByName(extra)),
            "text_hash", fpp=0.01, n_items=128)
        plain = {r["doc_id"]: (r["decision"], r["keep_id"])
                 for r in dedup.dedup_against_index(batch, idx).collect()}
        via = {r["doc_id"]: (r["decision"], r["keep_id"])
               for r in dedup.dedup_against_index(
                   batch, idx, index_bloom=superset).collect()}
        assert via == plain


class TestNearIndexBloomShortCircuit:
    """near_dup_against_index(index_bloom=...): probe over the
    composite (band, band_hash) bucket key reroutes signature rows
    around the bucket join without changing any verdict — including
    the null-id and repeated-id identity cases the operator handles."""

    def _corpus(self, spark, seed, n, vocab, with_nulls=False):
        rng = random.Random(seed)
        rows = []
        for i in range(n):
            text = " ".join(f"w{rng.randrange(vocab)}"
                            for _ in range(rng.randrange(5, 15)))
            did = None if (with_nulls and rng.random() < 0.1) else i
            rows.append((did, text))
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_verdicts_equal_plain_join(self, spark):
        hist = self._corpus(spark, 21, 50, 8, with_nulls=True)
        batch = self._corpus(spark, 22, 40, 10, with_nulls=True)
        idx = dedup.minhash_index(hist)
        keys = idx.select(dedup.bucket_key_expr().alias("k"))
        filt = bloom.build_bloom(keys, "k", fpp=0.01, n_items=400)
        rows = lambda df: sorted(
            ((r["doc_id"], r["text_hash"], r["is_near_dup"],
              r["match_id"]) for r in df.collect()),
            key=lambda t: (str(t[0]), t[1]))
        plain = rows(dedup.near_dup_against_index(batch, idx))
        via = rows(dedup.near_dup_against_index(batch, idx,
                                                index_bloom=filt))
        assert via == plain
        assert any(t[2] for t in plain)        # some collisions exist


class TestWithMightContainTransport:
    def test_broadcast_transport_agrees_with_literal(self, spark):
        """Above EXPR_MAX_WORDS the flag rides a single-row broadcast;
        verdicts must equal the literal expression's on the same
        filter (force both transports on one filter)."""
        members = _member_words(400, seed=9)
        df = spark.createDataFrame([(w,) for w in members], "v string")
        # big m so the dispatch picks the broadcast path
        m = (bloom.EXPR_MAX_WORDS + 1024) * 64
        filt = bloom.build_bloom(df, "v", m_bits=m, k=5)
        assert len(filt["words"]) > bloom.EXPR_MAX_WORDS
        probes = spark.createDataFrame(
            [(w,) for w in members[:200]]
            + [(f"no_{i}",) for i in range(300)] + [(None,)], "v string")
        via_bcast = bloom.with_might_contain(probes, "v", filt, "m")
        via_lit = probes.withColumn(
            "m", bloom.might_contain_expr("v", filt))
        key = lambda r: (r["v"] or "", bool(r["m"]))
        assert sorted(map(key, via_bcast.collect())) == \
               sorted(map(key, via_lit.collect()))

    def test_small_filter_uses_literal_no_join(self, spark):
        members = _member_words(50, seed=10)
        df = spark.createDataFrame([(w,) for w in members], "v string")
        filt = bloom.build_bloom(df, "v", n_items=50)
        out = bloom.with_might_contain(df, "v", filt, "m")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert out.where("m").count() == 50
