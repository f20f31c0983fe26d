"""Gap filling (LOCF + linear interpolation) and robust MAD outliers."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import anomaly, gapfill


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


class TestFillGaps:
    def test_locf_and_interp(self, spark):
        obs = spark.createDataFrame(
            [("a", _ts(0), 10.0), ("a", _ts(1), 20.0), ("a", _ts(4), 50.0),
             ("b", _ts(2), 7.0)],
            "key string, ts timestamp, value double")
        out = {(r["key"], r["ts"].hour): r
               for r in gapfill.fill_gaps(obs, "key", "ts", "value",
                                          step="1 hour").collect()}
        # spine covers each key's own bounds only
        assert set(out) == {("a", 0), ("a", 1), ("a", 2), ("a", 3),
                            ("a", 4), ("b", 2)}
        # observed rows pass through unfilled
        assert out[("a", 1)]["value"] == 20.0
        assert not out[("a", 1)]["filled"]
        assert out[("a", 1)]["value_locf"] == 20.0
        assert out[("a", 1)]["value_interp"] == 20.0
        # gap rows: LOCF carries, interp is linear between 20@1 and 50@4
        g2, g3 = out[("a", 2)], out[("a", 3)]
        assert g2["filled"] and g3["filled"]
        assert g2["value"] is None
        assert (g2["value_locf"], g3["value_locf"]) == (20.0, 20.0)
        assert g2["value_interp"] == pytest.approx(30.0)
        assert g3["value_interp"] == pytest.approx(40.0)
        # single-observation key: one spine row, itself
        assert out[("b", 2)]["value_locf"] == 7.0
        assert not out[("b", 2)]["filled"]

    def test_edges(self, spark):
        # leading gap (no prior obs): locf NULL, interp backfills nearest
        obs = spark.createDataFrame(
            [("k", _ts(0), None), ("k", _ts(1), None), ("k", _ts(2), 9.0)],
            "key string, ts timestamp, value double")
        # NULL-valued observed rows behave as gaps for filling purposes
        out = sorted(gapfill.fill_gaps(obs, "key", "ts", "value").collect(),
                     key=lambda r: r["ts"])
        assert [r["value_locf"] for r in out] == [None, None, 9.0]
        assert [r["value_interp"] for r in out] == [9.0, 9.0, 9.0]


class TestRobustOutliers:
    def test_flags_spike_mean_z_would_miss(self, spark):
        # 10 values near 10 plus one 1000x spike; classic z-score gets
        # dragged by the spike itself, the MAD z does not
        vals = [9.0, 10.0, 10.0, 10.0, 11.0, 10.0, 9.5, 10.5, 10.0, 10000.0]
        df = spark.createDataFrame([("t", v) for v in vals],
                                   "event_type string, value double")
        out = anomaly.robust_outliers(df, "value", ("event_type",))
        rows = {r["value"]: r for r in out.collect()}
        assert rows[10000.0]["is_outlier"]
        assert not any(r["is_outlier"] for v, r in rows.items()
                       if v != 10000.0)
        assert rows[10.0]["med"] == 10.0
        assert rows[10.0]["mad"] == 0.25

    def test_even_count_median_is_midpoint_avg(self, spark):
        df = spark.createDataFrame(
            [("t", v) for v in [1.0, 2.0, 4.0, 8.0]],
            "event_type string, value double")
        out = anomaly.robust_outliers(df, "value", ("event_type",))
        assert out.first()["med"] == 3.0  # (2+4)/2

    def test_mad_zero_means_no_scale(self, spark):
        # constant majority: MAD = 0 -> robust_z NULL, nothing flagged
        df = spark.createDataFrame(
            [("t", 5.0)] * 9 + [("t", 99.0)],
            "event_type string, value double")
        out = anomaly.robust_outliers(df, "value", ("event_type",))
        assert all(r["robust_z"] is None for r in out.collect())
        assert not any(r["is_outlier"] for r in out.collect())

    def test_per_key_isolation(self, spark):
        # the same value is an outlier under one key, normal under another
        df = spark.createDataFrame(
            [("small", v) for v in [1.0, 1.1, 0.9, 1.0, 50.0]]
            + [("big", v) for v in [40.0, 50.0, 60.0, 45.0, 50.0]],
            "event_type string, value double")
        out = anomaly.robust_outliers(df, "value", ("event_type",))
        flagged = {(r["event_type"], r["value"])
                   for r in out.collect() if r["is_outlier"]}
        assert flagged == {("small", 50.0)}
