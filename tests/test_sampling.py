"""Deterministic hash-based sampling: reproducibility, rate accuracy,
stratified rates, and independence from partitioning (the property
``df.sample`` lacks)."""

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import sampling


@pytest.fixture(scope="module")
def table(spark):
    return spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                     (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("lang"))


class TestHashSample:
    def test_rate_and_determinism(self, spark, table):
        a = {r["doc_id"] for r in
             sampling.hash_sample(table, 0.25).collect()}
        b = {r["doc_id"] for r in
             sampling.hash_sample(table.repartition(13), 0.25).collect()}
        assert a == b                      # partitioning-independent
        assert 0.2 < len(a) / 4000 < 0.3   # ~25%

    def test_seed_changes_membership(self, table):
        a = {r["doc_id"] for r in
             sampling.hash_sample(table, 0.5, seed=0).collect()}
        b = {r["doc_id"] for r in
             sampling.hash_sample(table, 0.5, seed=1).collect()}
        assert a != b
        # overlap ≈ rate², not 0 and not 100%
        assert 0.1 < len(a & b) / 4000 < 0.4

    def test_edge_rates(self, table):
        assert sampling.hash_sample(table, 0.0).count() == 0
        assert sampling.hash_sample(table, 1.0).count() == 4000

    def test_stratified_rates(self, table):
        out = sampling.stratified_sample(
            table, "lang", {"en": 1.0, "de": 0.25}, default_rate=0.0)
        by = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by["en"] == 1334            # every en row kept
        assert "fr" not in by              # default 0
        assert 0.15 < by["de"] / 1333 < 0.35


def test_rate_unbiased(spark):
    # regression for the 4-hex-char modulo bias: 65536 values mod 10000
    # made buckets 0-5535 7/6 as likely, so rate=0.1 actually kept
    # ~10.68% and rate=0.5 kept ~53.4%. With 8 hex chars the observed
    # rates over 20k sequential ids sit within sampling noise.
    from log2seq_spark.operators import sampling
    t = spark.range(20000).withColumnRenamed("id", "doc_id")
    for rate in (0.1, 0.5):
        got = sampling.hash_sample(t, rate).count() / 20000
        assert abs(got - rate) < 0.005, (rate, got)
