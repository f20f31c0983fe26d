"""Sink backend seam (plans/sink.py): backend election, explicit-iceberg
error without the runtime, and dynamic-partition-overwrite semantics of
the parquet writer."""

import os

import pytest
from pyspark.sql import functions as F

from log2seq_spark.plans.sink import (iceberg_available, read_partitioned,
                                      resolve_backend, write_partitioned)


class TestBackendElection:
    def test_auto_resolves_to_parquet_without_runtime(self, spark):
        if iceberg_available(spark):
            pytest.skip("iceberg runtime present; auto resolves to iceberg")
        assert resolve_backend(spark, "auto") == "parquet"

    def test_explicit_iceberg_errors_without_runtime(self, spark):
        if iceberg_available(spark):
            pytest.skip("iceberg runtime present")
        with pytest.raises(RuntimeError, match="iceberg"):
            resolve_backend(spark, "iceberg")

    def test_unknown_backend_rejected(self, spark):
        with pytest.raises(ValueError):
            resolve_backend(spark, "orc")


class TestParquetWriter:
    def test_dynamic_overwrite_keeps_untouched_partitions(
            self, spark, tmpdir_path):
        dest = os.path.join(tmpdir_path, "t")
        df1 = spark.createDataFrame(
            [("a", 1), ("b", 2)], "k string, v int")
        write_partitioned(df1, dest, ["k"])
        # second write touches only partition b; a must survive
        df2 = spark.createDataFrame([("b", 99)], "k string, v int")
        write_partitioned(df2, dest, ["k"])
        out = {(r["k"], r["v"]) for r in spark.read.parquet(dest).collect()}
        assert out == {("a", 1), ("b", 99)}
        # session conf was never mutated
        assert spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "STATIC").upper() == "STATIC"

    def test_read_partitioned_round_trips_through_seam(
            self, spark, tmpdir_path):
        dest = os.path.join(tmpdir_path, "rt")
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("b", 3)], "k string, v int")
        write_partitioned(df, dest, ["k"])
        back = read_partitioned(spark, dest)
        assert {(r["k"], r["v"]) for r in back.collect()} == \
            {("a", 1), ("b", 2), ("b", 3)}
        # partition column k is reconstructed, so a filter on it prunes
        # at scan time (PartitionFilters) rather than post-scan
        plan = back.filter(F.col("k") == "b")._jdf.queryExecution() \
                   .executedPlan().toString()
        assert "PartitionFilters: [" in plan and "isnotnull(k" in plan
