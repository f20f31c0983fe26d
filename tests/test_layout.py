"""Z-order clustered writes (multi-column data skipping) and bin-packing
small-file compaction with a resumable swap."""

import json
import os

import pytest
from pyspark.sql import functions as F

from log2seq_spark import fsio
from log2seq_spark.operators import layout


@pytest.fixture(scope="module")
def grid(spark):
    # two INDEPENDENT uniform keys — the layout either clusters both or
    # it doesn't; 40k rows, deterministic
    return spark.range(40_000).select(
        F.col("id").alias("row_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("y"))


def _multiset(df, cols=("row_id", "x", "y")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestZorder:
    def test_zorder_skips_on_both_columns(self, spark, grid, tmpdir_path):
        zpath = os.path.join(tmpdir_path, "z")
        spath = os.path.join(tmpdir_path, "s")
        layout.zorder_write(grid, zpath, ["x", "y"], bits=8, n_files=16)
        # contrast: single-column sort clusters x only
        (grid.repartitionByRange(16, "x").sortWithinPartitions("x")
             .write.parquet(spath))
        z = layout.skipping_effectiveness(spark, zpath, ["x", "y"])
        s = layout.skipping_effectiveness(spark, spath, ["x", "y"])
        # single-col sort: x tight, y spans everything
        assert s["x"] < 0.2 and s["y"] > 0.8
        # z-order: BOTH columns tight (16 files -> 4 z bits -> 2 bits
        # per col -> per-file width ~1/4; allow slack for range-sampler
        # imbalance)
        assert z["x"] < 0.5 and z["y"] < 0.5

    def test_roundtrip_is_lossless(self, spark, grid, tmpdir_path):
        zpath = os.path.join(tmpdir_path, "z2")
        layout.zorder_write(grid, zpath, ["x", "y"], bits=6, n_files=8)
        assert _multiset(spark.read.parquet(zpath)) == _multiset(grid)
        # the staging column does not leak into the written schema
        assert set(spark.read.parquet(zpath).columns) == {"row_id",
                                                          "x", "y"}

    def test_null_keys_get_a_real_z_value(self, spark, tmpdir_path):
        df = spark.range(100).select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") < 10, None)
             .otherwise(F.col("id")).alias("x"),
            F.col("id").alias("y"))
        out = layout.with_zorder(df, ["x", "y"], bits=4)
        rows = out.where(F.col("x").isNull()).select("__zorder_key")
        assert rows.count() == 10
        assert all(r[0] is not None for r in rows.collect())

    def test_validation(self, spark, grid):
        with pytest.raises(ValueError, match="62 usable bits"):
            layout.with_zorder(grid, ["x", "y"], bits=32)
        with pytest.raises(ValueError, match="no column"):
            layout.with_zorder(grid, ["nope"])
        strs = grid.withColumn("s", F.col("x").cast("string"))
        with pytest.raises(ValueError, match="numeric/date/timestamp"):
            layout.with_zorder(strs, ["s"])

    def test_low_cardinality_column_still_works(self, spark, tmpdir_path):
        # approxQuantile returns massively duplicated boundaries on a
        # 3-value column; the dedup path must keep bucket ids in range
        df = spark.range(5_000).select(
            F.col("id").alias("row_id"),
            F.pmod("id", F.lit(3)).alias("x"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("y"))
        p = os.path.join(tmpdir_path, "lowcard")
        layout.zorder_write(df, p, ["x", "y"], bits=8, n_files=4)
        assert spark.read.parquet(p).count() == 5_000


class TestCompaction:
    def _fragment(self, spark, path, n_rows=2_000, n_files=40):
        (spark.range(n_rows).select(
            F.col("id").alias("row_id"),
            F.xxhash64("id").alias("v"))
         .repartition(n_files).write.mode("overwrite").parquet(path))

    def test_compact_reduces_files_losslessly(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "frag")
        self._fragment(spark, p)
        before = spark.read.parquet(p)
        rows_before = sorted(tuple(r) for r in before.collect())
        n_before = len(layout._data_files(spark, p))
        assert n_before >= 40
        plan = layout.compact_dir(spark, p, target_bytes=1 << 20)
        assert plan["skipped"] is False
        assert plan["n_bins"] >= 1
        after = spark.read.parquet(p)
        assert sorted(tuple(r) for r in after.collect()) == rows_before
        n_after = len(layout._data_files(spark, p))
        assert n_after < n_before
        assert n_after <= plan["n_bins"] + (n_before - plan["n_small"])
        # manifest dropped, staging gone
        assert fsio.read_text(spark, f"{p}/{layout._MANIFEST}") is None
        assert not [d for d in os.listdir(p) if d.startswith(".compact-")]

    def test_healthy_files_left_alone(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "healthy")
        self._fragment(spark, p, n_rows=2_000, n_files=2)
        names = {f["name"] for f in layout._data_files(spark, p)}
        # target so small every file counts as healthy
        plan = layout.compact_dir(spark, p, target_bytes=64)
        assert plan["skipped"] is True
        assert {f["name"] for f in layout._data_files(spark, p)} == names

    def test_interrupted_swap_is_resumable(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "crash")
        self._fragment(spark, p, n_rows=1_000, n_files=10)
        rows = sorted(tuple(r)
                      for r in spark.read.parquet(p).collect())
        plan = layout.plan_compaction(spark, p, target_bytes=1 << 20)
        # reproduce compact_dir up to the manifest write, then "crash"
        # before any adoption
        staging = f"{p}/.compact-testcrash"
        srcs = [f"{p}/{n}" for n in plan["rewrite"]]
        (spark.read.parquet(*srcs).repartition(plan["n_bins"])
              .write.mode("overwrite").parquet(staging))
        staged = [f["name"] for f in layout._data_files(spark, staging)]
        fsio.write_text(spark, f"{p}/{layout._MANIFEST}", json.dumps(
            {"id": "testcrash", "staging": staging, "staged": staged,
             "originals": plan["rewrite"]}))
        assert layout.resume_compaction(spark, p) is True
        assert sorted(tuple(r)
                      for r in spark.read.parquet(p).collect()) == rows
        assert layout.resume_compaction(spark, p) is False  # idempotent

    def test_expire_partitions_dry_run_then_apply(self, spark,
                                                  tmpdir_path):
        root = os.path.join(tmpdir_path, "days")
        df = spark.range(300).select(
            F.col("id").alias("row_id"),
            F.concat(F.lit("2026-08-1"),
                     F.pmod("id", F.lit(5)).cast("string")).alias("day"))
        (df.write.partitionBy("day").mode("overwrite").parquet(root))
        # dry run: report only, nothing deleted
        rep = layout.expire_partitions(spark, root, "day", keep=2)
        assert [r["value"] for r in rep] == [
            "2026-08-10", "2026-08-11", "2026-08-12",
            "2026-08-13", "2026-08-14"]
        assert [r["expired"] for r in rep] == [True, True, True,
                                               False, False]
        assert not any(r["deleted"] for r in rep)
        assert spark.read.parquet(root).count() == 300
        # apply: three oldest gone, newest two intact
        rep = layout.expire_partitions(spark, root, "day", keep=2,
                                       apply=True)
        assert sum(r["deleted"] for r in rep) == 3
        left = spark.read.parquet(root)
        assert left.count() == 120
        # (Spark infers the partition value as a date; compare as str)
        assert {str(r["day"]) for r in
                left.select("day").distinct().collect()} == {
                    "2026-08-13", "2026-08-14"}
        # control files / other dirs untouched
        assert os.path.exists(os.path.join(root, "_SUCCESS"))

    def test_expire_keep_all_and_missing_root(self, spark, tmpdir_path):
        root = os.path.join(tmpdir_path, "none")
        assert layout.expire_partitions(spark, root, "day", 3) == []
        df = spark.range(10).select(
            F.col("id").alias("row_id"),
            F.lit("2026-01-01").alias("day"))
        df.write.partitionBy("day").parquet(root)
        rep = layout.expire_partitions(spark, root, "day", keep=5,
                                       apply=True)
        assert len(rep) == 1 and not rep[0]["expired"]
        assert spark.read.parquet(root).count() == 10

    def test_compact_tree_walks_partitioned_sink(self, spark,
                                                 tmpdir_path):
        root = os.path.join(tmpdir_path, "sink")
        df = spark.range(4_000).select(
            F.col("id").alias("row_id"),
            (F.pmod("id", F.lit(2))).cast("string").alias("sev"),
            F.xxhash64("id").alias("v"))
        (df.repartition(20).write.partitionBy("sev")
           .mode("overwrite").parquet(root))
        rows = sorted(tuple(r)
                      for r in spark.read.parquet(root)
                      .select("row_id", "v").collect())
        plans = layout.compact_tree(spark, root, target_bytes=1 << 20)
        leaves = {pl["dir"].rsplit("/", 1)[-1] for pl in plans}
        assert leaves == {"sev=0", "sev=1"}
        assert all(not pl["skipped"] for pl in plans)
        got = sorted(tuple(r)
                     for r in spark.read.parquet(root)
                     .select("row_id", "v").collect())
        assert got == rows


class TestRowMaintenance:
    """Copy-on-write DELETE (redaction) and keyed MERGE over a leaf dir:
    only files holding affected keys are rewritten, results are exact,
    and an interrupted swap resumes through the shared manifest."""

    def _sink(self, spark, path, n_rows=1_000, n_files=8):
        (spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"))
         .repartition(n_files).write.mode("overwrite").parquet(path))

    def test_delete_rows_exact_and_touches_only_affected(
            self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "redact")
        self._sink(spark, p)
        drop = spark.createDataFrame([(7,), (423,), (999,)],
                                     "doc_id bigint")
        hit = layout.affected_files(spark, p, drop, "doc_id")
        untouched = {f["name"] for f in layout._data_files(spark, p)
                     } - set(hit)
        rep = layout.delete_rows(spark, p, drop, "doc_id")
        assert rep["n_deleted"] == 3 and rep["affected_files"] == len(hit)
        after = spark.read.parquet(p)
        assert after.count() == 997
        assert after.where(
            F.col("doc_id").isin(7, 423, 999)).count() == 0
        # files with no affected key were not rewritten
        assert untouched <= {f["name"]
                             for f in layout._data_files(spark, p)}
        assert fsio.read_text(spark, f"{p}/{layout._MANIFEST}") is None

    def test_delete_rows_no_match_is_noop(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "noop")
        self._sink(spark, p, n_rows=100, n_files=2)
        names = {f["name"] for f in layout._data_files(spark, p)}
        rep = layout.delete_rows(
            spark, p, spark.createDataFrame([(10**9,)], "doc_id bigint"),
            "doc_id")
        assert rep["skipped"] is True
        assert {f["name"] for f in layout._data_files(spark, p)} == names

    def test_merge_upsert_updates_and_inserts(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "merge")
        self._sink(spark, p, n_rows=500, n_files=4)
        ups = spark.createDataFrame(
            [(5, "patched-5"), (77, "patched-77"), (9_999, "new-9999")],
            "doc_id bigint, text string")
        rep = layout.merge_upsert(spark, p, ups, "doc_id")
        assert rep["n_updated"] == 2 and rep["n_inserted"] == 1
        after = {r["doc_id"]: r["text"]
                 for r in spark.read.parquet(p).collect()}
        assert len(after) == 501
        assert after[5] == "patched-5" and after[77] == "patched-77"
        assert after[9999] == "new-9999"
        assert after[6] == "text-6"          # untouched row intact

    def test_merge_all_inserts_keeps_existing_files(self, spark,
                                                    tmpdir_path):
        p = os.path.join(tmpdir_path, "insonly")
        self._sink(spark, p, n_rows=50, n_files=2)
        names = {f["name"] for f in layout._data_files(spark, p)}
        ups = spark.createDataFrame([(1_000, "n1"), (1_001, "n2")],
                                    "doc_id bigint, text string")
        rep = layout.merge_upsert(spark, p, ups, "doc_id")
        assert rep["affected_files"] == 0 and rep["n_inserted"] == 2
        assert names <= {f["name"] for f in layout._data_files(spark, p)}
        assert spark.read.parquet(p).count() == 52

    def test_merge_rejects_duplicate_update_keys(self, spark,
                                                 tmpdir_path):
        p = os.path.join(tmpdir_path, "dupkeys")
        self._sink(spark, p, n_rows=10, n_files=1)
        ups = spark.createDataFrame([(1, "a"), (1, "b")],
                                    "doc_id bigint, text string")
        with pytest.raises(ValueError, match="duplicate"):
            layout.merge_upsert(spark, p, ups, "doc_id")

    def test_interrupted_redaction_swap_resumes(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "redcrash")
        self._sink(spark, p, n_rows=200, n_files=4)
        drop = spark.createDataFrame([(3,), (150,)], "doc_id bigint")
        hit = layout.affected_files(spark, p, drop, "doc_id")
        # reproduce delete_rows up to the manifest write, then "crash"
        srcs = [f"{p}/{n}" for n in hit]
        survivors = (spark.read.parquet(*srcs)
                     .join(drop, "doc_id", "anti"))
        staging = f"{p}/.redacted-testcrash"
        survivors.repartition(len(hit)).write.mode(
            "overwrite").parquet(staging)
        staged = [f["name"] for f in layout._data_files(spark, staging)]
        fsio.write_text(spark, f"{p}/{layout._MANIFEST}", json.dumps(
            {"id": "testcrash", "staging": staging, "staged": staged,
             "originals": hit, "prefix": "redacted"}))
        assert layout.resume_compaction(spark, p) is True
        after = spark.read.parquet(p)
        assert after.count() == 198
        assert after.where(F.col("doc_id").isin(3, 150)).count() == 0
        adopted = [f["name"] for f in layout._data_files(spark, p)
                   if f["name"].startswith("redacted-testcrash-")]
        assert adopted
