"""Salted skew join + skew stats (operators/skew.py): result equality
with the plain join, actual reducer spreading of hot keys, and the
sizing helper."""

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import skew


def _skewed_events(spark, n=4000):
    # 70% of rows on one hot key, remainder uniform over 50 keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 7, F.lit("hot"))
         .otherwise(F.concat(F.lit("k"), (F.col("id") % 50)))
         .alias("key"),
        F.col("id").alias("payload"))


def _dim(spark):
    rows = [("hot", "HOT")] + [(f"k{i}", f"D{i}") for i in range(50)]
    return spark.createDataFrame(rows, "key string, label string")


class TestSaltedJoin:
    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_matches_plain_join(self, spark, how):
        left = _skewed_events(spark)
        # drop some dim rows so inner vs left actually differ
        dim = _dim(spark).filter(F.col("key") != "k7")
        plain = left.join(dim, "key", how)
        salted = skew.salted_join(left, dim, "key", n_salt=8, how=how)
        assert salted.columns == plain.columns
        a = {tuple(r) for r in salted.collect()}
        b = {tuple(r) for r in plain.collect()}
        assert a == b
        assert salted.count() == plain.count()  # multiset, not just set

    def test_hot_key_spreads_over_salts(self, spark):
        left = _skewed_events(spark)
        salted = left.withColumn(
            "_s", F.pmod(F.hash(F.struct(*left.columns)), F.lit(8)))
        n_salts = (salted.filter(F.col("key") == "hot")
                         .select("_s").distinct().count())
        assert n_salts == 8  # 2800 hot rows hit every salt w.h.p.

    def test_multi_column_key(self, spark):
        left = spark.createDataFrame(
            [("a", 1, 10), ("a", 1, 11), ("b", 2, 12)],
            "k1 string, k2 int, v int")
        right = spark.createDataFrame(
            [("a", 1, "x"), ("b", 2, "y")], "k1 string, k2 int, w string")
        got = {tuple(r) for r in
               skew.salted_join(left, right, ["k1", "k2"], n_salt=4)
                   .collect()}
        want = {tuple(r) for r in left.join(right, ["k1", "k2"]).collect()}
        assert got == want

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1)], "key string, v int")
        with pytest.raises(ValueError):
            skew.salted_join(df, df, "key", how="full")
        with pytest.raises(ValueError):
            skew.salted_join(df, df, "key", n_salt=0)
        poisoned = df.withColumn("__skew_salt", F.lit(1))
        with pytest.raises(ValueError):
            skew.salted_join(poisoned, df, "key")

    def test_duplicate_build_rows_preserved(self, spark):
        # build side with duplicate keys: multiplicity must match the
        # plain join (each build row replicates once per salt, joins
        # once per matching salted row)
        left = spark.createDataFrame([("a", i) for i in range(20)],
                                     "key string, v int")
        right = spark.createDataFrame([("a", "x"), ("a", "y")],
                                      "key string, w string")
        got = skew.salted_join(left, right, "key", n_salt=4)
        assert got.count() == 40  # 20 rows x 2 matching build rows


class TestKeySkewStats:
    def test_counts_and_factor(self, spark):
        df = spark.createDataFrame(
            [("hot",)] * 30 + [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1,
            "key string")
        rows = skew.key_skew_stats(df, "key", top=2).collect()
        assert [r["key"] for r in rows] == ["hot", "a"]
        assert rows[0]["n"] == 30
        assert rows[0]["skew_factor"] == 3.0  # mean = 40/4 keys = 10

    def test_top_bounds_output(self, spark):
        df = spark.createDataFrame([(f"k{i % 40}",) for i in range(400)],
                                   "key string")
        assert skew.key_skew_stats(df, "key", top=5).count() == 5
