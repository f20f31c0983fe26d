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
            resolve_backend(spark, "avro")

    def test_orc_resolves_natively(self, spark):
        assert resolve_backend(spark, "orc") == "orc"

    def test_auto_is_parquet_in_this_sandbox(self, spark):
        """Seam honesty: this environment has no Iceberg runtime jar
        (BASELINE.md), so 'auto' MUST elect parquet here. If this test
        ever fails because the jar appeared, the real-roundtrip test
        below stops skipping and takes over coverage of the branch."""
        if iceberg_available(spark):
            pytest.skip("iceberg runtime present; covered by the "
                        "roundtrip test instead")
        assert resolve_backend(spark, "auto") == "parquet"

    def test_real_iceberg_roundtrip_when_runtime_present(
            self, spark, tmpdir_path):
        """End-to-end write/read through the REAL iceberg branch —
        requires the Iceberg Spark runtime jar, which this sandbox does
        not ship, so the test skips VISIBLY (never silently passes); an
        environment with the jar exercises the branch automatically."""
        if not iceberg_available(spark):
            pytest.skip("iceberg runtime jar absent in this sandbox; "
                        "the iceberg write/read branch has never executed "
                        "here by construction")
        from log2seq_spark.plans import sink
        spark.conf.set("spark.sql.catalog.it_cat",
                       "org.apache.iceberg.spark.SparkCatalog")
        spark.conf.set("spark.sql.catalog.it_cat.type", "hadoop")
        spark.conf.set("spark.sql.catalog.it_cat.warehouse",
                       f"{tmpdir_path}/warehouse")
        df = spark.createDataFrame(
            [("a", 1), ("b", 2)], "k string, v int")
        sink.write_partitioned(df, "/ignored", ["k"], backend="iceberg",
                               iceberg_table="it_cat.ns.t")
        got = {(r["k"], r["v"]) for r in sink.read_partitioned(
            spark, "/ignored", backend="iceberg",
            iceberg_table="it_cat.ns.t").collect()}
        assert got == {("a", 1), ("b", 2)}
        # dynamic partition overwrite: rewriting k='a' keeps k='b'
        sink.write_partitioned(
            spark.createDataFrame([("a", 9)], "k string, v int"),
            "/ignored", ["k"], backend="iceberg",
            iceberg_table="it_cat.ns.t")
        got = {(r["k"], r["v"]) for r in sink.read_partitioned(
            spark, "/ignored", backend="iceberg",
            iceberg_table="it_cat.ns.t").collect()}
        assert got == {("a", 9), ("b", 2)}


class _FakeWriter:
    """Records the DataFrameWriterV2 call chain write_partitioned makes."""

    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def partitionedBy(self, *cols):
        self.calls.append(("partitionedBy", len(cols)))
        return self

    def create(self):
        self.calls.append(("create",))

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))

    def overwritePartitions(self):
        self.calls.append(("overwritePartitions",))


class TestIcebergBranch:
    """The iceberg code path, driven without the runtime jar: backend
    resolution and catalog lookup are monkeypatched, the writeTo chain is
    recorded. Guards the invariant that an EXISTING table is only ever
    dynamically overwritten (a transient commit failure must surface, not
    be healed by createOrReplace dropping prior partitions)."""

    def _run(self, spark, monkeypatch, table_exists):
        import log2seq_spark.plans.sink as sink
        calls = []
        df = spark.createDataFrame([("a", 1)], "k string, v int")
        monkeypatch.setattr(sink, "resolve_backend",
                            lambda s, b: "iceberg")
        monkeypatch.setattr(spark.catalog.__class__, "tableExists",
                            lambda self, t: table_exists)
        monkeypatch.setattr(df.__class__, "writeTo",
                            lambda self, t: _FakeWriter(calls))
        sink.write_partitioned(df, "/ignored", ["k"], backend="iceberg",
                               iceberg_table="ns.t")
        return calls

    def test_first_write_creates_partitioned_table(self, spark, monkeypatch):
        calls = self._run(spark, monkeypatch, table_exists=False)
        assert calls == [("using", "iceberg"), ("partitionedBy", 1),
                         ("create",)]

    def test_existing_table_only_overwrites_partitions(
            self, spark, monkeypatch):
        calls = self._run(spark, monkeypatch, table_exists=True)
        assert calls == [("overwritePartitions",)]

    def test_read_partitioned_reads_catalog_table(self, spark, monkeypatch):
        import log2seq_spark.plans.sink as sink
        monkeypatch.setattr(sink, "resolve_backend", lambda s, b: "iceberg")
        seen = []
        monkeypatch.setattr(spark.__class__, "table",
                            lambda self, t: seen.append(t) or "DF")
        assert sink.read_partitioned(spark, "/x/ns/t",
                                     backend="iceberg") == "DF"
        assert seen == ["ns.t"]   # _path_to_table fallback


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


class TestOrcBackend:
    def test_pipeline_through_orc_equals_parquet(self, spark, tmpdir_path):
        """The same pipeline run through the orc backend must commit
        identical metrics and routed contents as parquet — the seam only
        swaps the physical format."""
        from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
        from log2seq_spark.sources.transcripts import transcripts
        turns = transcripts(spark, 40, seed=11, partitions=4)
        results = {}
        rows = {}
        for backend in ("parquet", "orc"):
            out = f"{tmpdir_path}/{backend}"
            cfg = PipelineConfig(out_dir=out, n_buckets=4, partitions=4,
                                 input_id="orc-vs-parquet",
                                 sink_backend=backend)
            res = run_pipeline(spark, turns, cfg, resume=False)
            results[backend] = {k: v for k, v in res.metrics.items()
                                if not k.startswith("wall_")}
            reader = (spark.read.orc if backend == "orc"
                      else spark.read.parquet)
            rows[backend] = {
                (r["conv_id"], r["turn_idx"],
                 tuple(r["words"] or []), r["sink"])
                for r in reader(f"{out}/routed").collect()}
        assert results["orc"] == results["parquet"]
        assert rows["orc"] == rows["parquet"]

    def test_orc_resume_skips_completed(self, spark, tmpdir_path):
        from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
        from log2seq_spark.sources.transcripts import transcripts
        turns = transcripts(spark, 20, seed=3, partitions=2)
        cfg = PipelineConfig(out_dir=f"{tmpdir_path}/o", n_buckets=4,
                             partitions=4, input_id="orc-resume",
                             sink_backend="orc")
        first = run_pipeline(spark, turns, cfg, resume=True)
        again = run_pipeline(spark, turns, cfg, resume=True)
        assert again.buckets_processed == []
        assert sorted(again.buckets_skipped) == sorted(first.buckets_processed)
