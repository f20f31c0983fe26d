"""CLI surfaces for the layout + data-quality operators: ``check``,
``compact``, ``zorder``. Runs ``main()`` in-process against the shared
session Spark fixture."""

import os

import pytest
from pyspark.sql import functions as F

from log2seq_spark.__main__ import main


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli_layout") / "docs")
    (spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)).alias("y"),
        F.concat(F.lit("text "), F.col("id")).alias("text"))
     .repartition(20).write.parquet(p))
    return p


class TestCheck:
    def test_pass_exit_0(self, spark, docs_path, capsys):
        code = main(["check", "--input", docs_path,
                     "--not-null", "doc_id", "--unique", "doc_id",
                     "--range", "x:0:", "--matches", r"text:^text \d+$",
                     "--min-rows", "100"])
        out = capsys.readouterr().out
        assert code == 0
        assert out.count("PASS") == 5 and "FAIL" not in out

    def test_fail_exit_1(self, spark, docs_path, capsys):
        code = main(["check", "--input", docs_path,
                     "--range", "x:0:5", "--min-rows", "1"])
        cap = capsys.readouterr()
        assert code == 1
        assert "FAIL\tin_range(x)" in cap.out
        assert "1/2 checks passed" in cap.err

    def test_no_checks_exit_2(self, spark, docs_path, capsys):
        assert main(["check", "--input", docs_path]) == 2
        assert "no checks given" in capsys.readouterr().err


class TestCompact:
    def test_compact_and_dry_run(self, spark, docs_path, capsys,
                                 tmpdir_path):
        p = os.path.join(tmpdir_path, "frag")
        spark.read.parquet(docs_path).repartition(30).write.parquet(p)
        code = main(["compact", "--path", p, "--target-mb", "1",
                     "--dry-run"])
        err = capsys.readouterr().err
        assert code == 0 and "[plan]" in err
        n_before = len([f for f in os.listdir(p)
                        if f.endswith(".parquet")])
        code = main(["compact", "--path", p, "--target-mb", "1"])
        err = capsys.readouterr().err
        assert code == 0 and "[done]" in err
        n_after = len([f for f in os.listdir(p)
                       if f.endswith(".parquet")])
        assert n_after < n_before
        assert spark.read.parquet(p).count() == 2000


    def test_dry_run_walks_partitioned_leaves_like_apply(
            self, spark, capsys, tmpdir_path):
        # regression: --dry-run planned only [args.path], so on a
        # partitioned sink (the documented use case) it reported ZERO
        # rewrites while --apply rewrote many — the decide-before-
        # acting flag lied. Dry-run must now walk the same leaf set.
        root = os.path.join(tmpdir_path, "part")
        (spark.range(2000).select(
            F.col("id").alias("row_id"),
            F.pmod("id", F.lit(3)).cast("string").alias("sink"))
         .repartition(12).write.partitionBy("sink").parquet(root))
        code = main(["compact", "--path", root, "--target-mb", "1",
                     "--dry-run"])
        err = capsys.readouterr().err
        plan_lines = [ln for ln in err.splitlines()
                      if ln.startswith("# [plan]")]
        assert code == 0 and len(plan_lines) == 3  # one per sink leaf
        planned_total = err.splitlines()[-1]
        code = main(["compact", "--path", root, "--target-mb", "1"])
        err = capsys.readouterr().err
        done_lines = [ln for ln in err.splitlines()
                      if ln.startswith("# [")]
        assert code == 0 and len(done_lines) == 3
        # identical plan: same total files -> bins line
        assert err.splitlines()[-1] == planned_total
        assert spark.read.parquet(root).count() == 2000


class TestExpire:
    def test_dry_run_then_apply(self, spark, capsys, tmpdir_path):
        root = os.path.join(tmpdir_path, "ret")
        (spark.range(100).select(
            F.col("id").alias("row_id"),
            F.concat(F.lit("h0"),
                     F.pmod("id", F.lit(4)).cast("string")).alias("hr"))
         .write.partitionBy("hr").parquet(root))
        code = main(["expire", "--path", root, "--col", "hr",
                     "--keep", "1"])
        err = capsys.readouterr().err
        assert code == 0
        assert "3 expired (dry-run; pass --apply)" in err
        assert spark.read.parquet(root).count() == 100
        code = main(["expire", "--path", root, "--col", "hr",
                     "--keep", "1", "--apply"])
        err = capsys.readouterr().err
        assert code == 0 and "deleted" in err
        assert spark.read.parquet(root).count() == 25


class TestZorder:
    def test_zorder_reports_effectiveness(self, spark, docs_path,
                                          capsys, tmpdir_path):
        out_dir = os.path.join(tmpdir_path, "z")
        code = main(["zorder", "--input", docs_path, "--out", out_dir,
                     "--cols", "x,y", "--bits", "8", "--files", "8"])
        err = capsys.readouterr().err
        assert code == 0
        assert "mean envelope width x" in err
        assert "mean envelope width y" in err
        assert spark.read.parquet(out_dir).count() == 2000

    def test_string_key_exit_2(self, spark, docs_path, capsys,
                               tmpdir_path):
        code = main(["zorder", "--input", docs_path,
                     "--out", os.path.join(tmpdir_path, "z2"),
                     "--cols", "text"])
        assert code == 2
        assert "numeric/date/timestamp" in capsys.readouterr().err


class TestRedactUpsertCLI:
    @pytest.fixture()
    def sink(self, spark, tmpdir_path):
        p = os.path.join(tmpdir_path, "sink")
        (spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id")).alias("text"))
         .repartition(4).write.parquet(p))
        return p

    def test_redact_then_upsert_roundtrip(self, spark, sink, tmpdir_path,
                                          capsys):
        keys = os.path.join(tmpdir_path, "keys")
        spark.createDataFrame([(3,), (7,)], "doc_id bigint") \
             .write.parquet(keys)
        assert main(["redact", "--path", sink, "--keys", keys,
                     "--key", "doc_id"]) == 0
        err = capsys.readouterr().err
        assert "rows deleted" in err
        ups = os.path.join(tmpdir_path, "ups")
        spark.createDataFrame([(5, "patched"), (500, "new")],
                              "doc_id bigint, text string") \
             .write.parquet(ups)
        assert main(["upsert", "--path", sink, "--updates", ups,
                     "--key", "doc_id"]) == 0
        after = {r["doc_id"]: r["text"]
                 for r in spark.read.parquet(sink).collect()}
        assert len(after) == 99
        assert 3 not in after and 7 not in after
        assert after[5] == "patched" and after[500] == "new"

    def test_upsert_duplicate_keys_exit_2(self, spark, sink, tmpdir_path,
                                          capsys):
        ups = os.path.join(tmpdir_path, "dups")
        spark.createDataFrame([(1, "a"), (1, "b")],
                              "doc_id bigint, text string") \
             .write.parquet(ups)
        assert main(["upsert", "--path", sink, "--updates", ups,
                     "--key", "doc_id"]) == 2
        assert "duplicate" in capsys.readouterr().err
