"""End-to-end Spark pipeline tests on the deterministic synthetic
transcripts: per-turn byte-exact equality vs the pure oracle, routing /
aggregate counts vs an independent oracle computation, and the
checkpoint-manifest resume contract."""

import os

import pytest
from pyspark.sql import functions as F

from log2seq_spark.rules import LineEngine, ParseFailure
from log2seq_spark.rules.presets import default_program
from log2seq_spark.sources.transcripts import transcripts
from log2seq_spark.plans.pipeline import (PipelineConfig, run_pipeline,
                                          enriched_turns)
from log2seq_spark.plans import manifest as mf

N_CONVS = 120  # ≈ 1.3k turns with the skewed length mix


@pytest.fixture(scope="module")
def turns(spark):
    df = transcripts(spark, N_CONVS, seed=42, partitions=8).cache()
    df.count()
    yield df
    df.unpersist()


def _oracle_rows(turns_df):
    """Single-process reimplementation over the collected turns."""
    program = default_program()
    rows = turns_df.select("conv_id", "turn_idx", "text", "ts").collect()
    engines = {}
    out = {}
    for r in rows:
        year = r["ts"].year
        eng = engines.get(year)
        if eng is None:
            eng = LineEngine(program, default_year=year)
            engines[year] = eng
        try:
            parsed = eng.parse_line(r["text"])
        except ParseFailure:
            parsed = {"error": "fail"}
        out[(r["conv_id"], r["turn_idx"])] = (r["text"], parsed)
    return out


class TestPipelineEquality:
    def test_generator_shape(self, turns):
        n = turns.count()
        assert n > 500
        assert turns.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        assert turns.select("conv_id").distinct().count() == N_CONVS

    def test_per_turn_equality_vs_oracle(self, spark, turns):
        oracle = _oracle_rows(turns)
        got = enriched_turns(spark, turns, PipelineConfig(out_dir="unused")) \
            .select("conv_id", "turn_idx", "parsed.*").collect()
        assert len(got) == len(oracle)
        n_ok = 0
        for row in got:
            text, exp = oracle[(row["conv_id"], row["turn_idx"])]
            if exp is None:               # empty line
                assert row["rule_id"] == -2
                continue
            if "error" in exp and "words" not in exp:
                assert row["error"] is not None
                continue
            assert row["message"] == exp["message"], text
            assert row["words"] == exp["words"], text
            assert row["symbols"] == exp["symbols"], text
            assert row["host"] == exp.get("host"), text
            # byte-exact reconstruction per turn
            w, s = row["words"], row["symbols"]
            assert len(s) == len(w) + 1
            rebuilt = s[0] + "".join(a + b for a, b in zip(w, s[1:]))
            assert rebuilt == row["message"]
            wall = exp["timestamp"].replace(tzinfo=None)
            assert row["ts"] == wall, text
            n_ok += 1
        assert n_ok > 0.9 * len(got)

    def test_routing_and_aggregates(self, spark, turns, tmpdir_path):
        cfg = PipelineConfig(out_dir=tmpdir_path, n_buckets=8, partitions=8)
        res = run_pipeline(spark, turns, cfg, resume=False)
        n = turns.count()
        assert res.metrics["n_rows"] == n
        assert res.metrics["n_ok"] + res.metrics["n_fail"] + res.metrics["n_empty"] == n

        routed = spark.read.parquet(os.path.join(tmpdir_path, "routed"))
        assert routed.count() == n
        # quarantine = failures + empties
        nq = routed.filter(F.col("sink") == "quarantine").count()
        assert nq == res.metrics["n_fail"] + res.metrics["n_empty"]
        # sink counts table agrees with routed data
        sc = spark.read.parquet(os.path.join(tmpdir_path, "agg_sink_counts"))
        lhs = {(r["sink"], r["bucket"]): r["n_rows"] for r in sc.collect()}
        rhs = {(r["sink"], r["bucket"]): r["cnt"]
               for r in routed.groupBy("sink", "bucket")
                              .agg(F.count("*").alias("cnt")).collect()}
        assert lhs == rhs
        # token counts: total equals sum over words
        tc = spark.read.parquet(os.path.join(tmpdir_path, "agg_token_counts"))
        assert tc.agg(F.sum("n")).first()[0] == res.metrics["n_tokens"]
        # oracle cross-check of ok/fail counters
        oracle = _oracle_rows(turns)
        exp_ok = sum(1 for _, (t, p) in oracle.items()
                     if p is not None and "words" in p)
        assert res.metrics["n_ok"] == exp_ok

    def test_resume_skips_completed_buckets(self, spark, turns, tmpdir_path):
        cfg = PipelineConfig(out_dir=tmpdir_path, n_buckets=8, partitions=8)
        # simulate a prior partial run: only buckets {0..3} committed
        first = turns.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int"))
        subset = first.filter("bucket < 4").drop("bucket")
        res1 = run_pipeline(spark, subset, cfg, resume=True)
        assert set(res1.buckets_processed) <= set(range(4))

        # full rerun resumes: completed buckets skipped, rest processed
        res2 = run_pipeline(spark, turns, cfg, resume=True)
        assert set(res2.buckets_skipped) == set(res1.buckets_processed)
        assert not (set(res2.buckets_processed) & set(res1.buckets_processed))

        # final state identical to a one-shot run in a fresh dir
        fresh = tmpdir_path + "_fresh"
        run_pipeline(spark, turns,
                     PipelineConfig(out_dir=fresh, n_buckets=8, partitions=8),
                     resume=False)
        a = spark.read.parquet(os.path.join(tmpdir_path, "routed"))
        b = spark.read.parquet(os.path.join(fresh, "routed"))
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

        # manifest carries per-bucket lineage + metrics
        recs = mf.read_manifest(tmpdir_path)
        assert all("lineage_id" in r and "n_rows" in r for r in recs)
        total = sum(r["n_rows"] for r in recs)
        assert total == turns.count()

    def test_stale_lineage_not_counted(self, spark, turns, tmpdir_path):
        # run lineage A over the full table, then lineage B (different
        # input_id) over ~half the rows into the SAME out_dir: B's
        # aggregates and routed read-back must not absorb A's leftovers.
        cfg_a = PipelineConfig(out_dir=tmpdir_path, n_buckets=8,
                               partitions=8, input_id="inputA")
        run_pipeline(spark, turns, cfg_a, resume=True)
        half = turns.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0)
        n_half = half.count()
        assert 0 < n_half < turns.count()
        cfg_b = PipelineConfig(out_dir=tmpdir_path, n_buckets=8,
                               partitions=8, input_id="inputB")
        res_b = run_pipeline(spark, half, cfg_b, resume=True)
        assert res_b.metrics["n_rows"] == n_half
        routed = spark.read.parquet(os.path.join(tmpdir_path, "routed"))
        assert routed.count() == n_half
        sc = spark.read.parquet(os.path.join(tmpdir_path, "agg_sink_counts"))
        assert sc.agg(F.sum("n_rows")).first()[0] == n_half


class TestArrowEngineParity:
    def test_arrow_equals_pandas_udf(self, spark, turns):
        from log2seq_spark.functions.udf import with_parsed
        from log2seq_spark.rules.presets import default_program
        prog = default_program()
        cols = ["conv_id", "turn_idx", "parsed"]
        a = (with_parsed(turns, prog, engine="pandas").select(cols)
             .orderBy("conv_id", "turn_idx").collect())
        b = (with_parsed(turns, prog, engine="arrow").select(cols)
             .orderBy("conv_id", "turn_idx").collect())
        assert a == b


class TestSkewHandling:
    def test_salted_repartition_splits_monster_conversation(
            self, spark, tmpdir_path):
        """North-rule skew clause: one pathologically long conversation
        must NOT serialize onto one task. The chunk salt in
        enriched_turns splits it across partitions, bounding the largest
        partition, while per-turn parse results stay keyed-identical."""
        import pandas as pd
        monster = pd.DataFrame({
            "conv_id": "monster", "turn_idx": range(20_000),
            "role": "user", "tool": None,
            "text": [f"Jan  1 12:00:{i % 60:02d} h{i % 7} app[{i}]: INFO m{i}"
                     for i in range(20_000)]})
        small = pd.DataFrame({
            "conv_id": [f"c{i}" for i in range(100) for _ in range(5)],
            "turn_idx": list(range(5)) * 100,
            "role": "assistant", "tool": None,
            "text": "Jan  1 12:00:00 h0 app[1]: INFO ok"})
        pdf = pd.concat([monster, small], ignore_index=True)
        pdf["ts"] = pd.Timestamp("2024-01-01")
        turns = spark.createDataFrame(pdf)

        cfg = PipelineConfig(out_dir=os.path.join(tmpdir_path, "skew"),
                             n_buckets=8, turn_chunk=1024, partitions=16)
        df = enriched_turns(spark, turns, cfg)
        sizes = (df.groupBy(F.spark_partition_id().alias("pid"))
                   .count().toPandas())
        # 20k monster turns / 1024-chunk salt ≈ 20 chunks over 16
        # partitions: the largest partition must hold well under the
        # whole conversation (unsalted it would hold all 20_500-ish rows
        # of its hash bucket)
        assert int(sizes["count"].max()) < 8_000, sizes.to_dict()
        assert int(sizes["count"].sum()) == 20_500
        # correctness is salt-independent: keyed per-turn results equal
        # an unsalted (single-chunk) run
        a = {(r["conv_id"], r["turn_idx"]): r["words"]
             for r in df.select("conv_id", "turn_idx", "parsed.words")
                        .collect()}
        cfg2 = PipelineConfig(out_dir=os.path.join(tmpdir_path, "skew2"),
                              n_buckets=8, turn_chunk=10**9, partitions=16)
        b = {(r["conv_id"], r["turn_idx"]): r["words"]
             for r in enriched_turns(spark, turns, cfg2)
                        .select("conv_id", "turn_idx", "parsed.words")
                        .collect()}
        assert a == b


def test_tokens_heavy_k_bounded_aggregate(spark, turns, tmpdir_path):
    """tokens_heavy_k switches AGG_TOKEN to exact per-(bucket, sink)
    heavy hitters: the written table must equal the full token-count
    table filtered to tokens above 1/k of their sink's volume."""
    import os

    from pyspark.sql import functions as F
    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
    # k=20 → tokens above 5% of their sink: the severity words (WARN,
    # INFO, …) sit at ~6-9% per sink in the synthetic corpus, so the
    # heavy table is non-empty while almost all tokens are pruned
    k = 20
    cfg = PipelineConfig(out_dir=os.path.join(tmpdir_path, "hk"),
                         n_buckets=4, partitions=8, tokens_heavy_k=k)
    run_pipeline(spark, turns, cfg, resume=False)
    got = {(r["bucket"], r["sink"], r["token"], r["n"])
           for r in spark.read.parquet(
               os.path.join(tmpdir_path, "hk", "agg_token_counts"))
           .collect()}
    # expected: full counts over the routed ok rows, HAVING n*k > total
    routed = (spark.read.parquet(os.path.join(tmpdir_path, "hk", "routed"))
              .filter(F.col("ok"))
              .select("bucket", "sink", F.explode("words").alias("token")))
    full = routed.groupBy("bucket", "sink", "token") \
                 .agg(F.count("*").alias("n"))
    totals = routed.groupBy("bucket", "sink") \
                   .agg(F.count("*").alias("tot"))
    want = {(r["bucket"], r["sink"], r["token"], r["n"])
            for r in full.join(totals, ["bucket", "sink"])
                         .filter(F.col("n") * k > F.col("tot"))
                         .collect()}
    assert got == want
    assert got  # the skewed synthetic corpus has hot tokens per sink


def test_empty_input_pipeline(spark, tmpdir_path):
    """A zero-row turns frame must complete cleanly with zeroed metrics
    (regression guard: the stats-collect path must not assume rows)."""
    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
    from log2seq_spark.sources.transcripts import transcripts
    empty = transcripts(spark, 1, seed=1, partitions=1).limit(0)
    cfg = PipelineConfig(out_dir=tmpdir_path + "/out", n_buckets=4,
                         partitions=4, input_id="empty-test")
    res = run_pipeline(spark, empty, cfg, resume=False)
    assert res.metrics == {"n_rows": 0, "n_ok": 0, "n_fail": 0,
                           "n_empty": 0, "n_tokens": 0}
    assert res.buckets_processed == []


def test_backend_mismatch_on_resume_raises(spark, tmpdir_path, turns):
    """Resuming an out_dir written as parquet with --sink-backend orc is
    a real failure and must raise — the old broad except AnalysisException
    around the routed read-back turned it into a silent zero-metric
    success."""
    import pytest
    from log2seq_spark.plans.pipeline import PipelineConfig, run_pipeline
    cfg = PipelineConfig(out_dir=tmpdir_path + "/out", n_buckets=4,
                         partitions=4, input_id="mix-test")
    run_pipeline(spark, turns.limit(200), cfg, resume=False)
    bad = PipelineConfig(out_dir=tmpdir_path + "/out", n_buckets=4,
                         partitions=4, input_id="mix-test",
                         sink_backend="orc")
    # fully-resumed rerun: nothing is rewritten, so the routed dir still
    # holds only parquet data files and the orc read-back must fail
    with pytest.raises(Exception):
        run_pipeline(spark, turns.limit(200), bad, resume=True)


class TestShortMessageRouting:
    def test_short_message_routes_unrouted_not_crash(self, spark):
        # ANSI mode (Spark 4's default, live in this session) makes
        # element_at THROW on a <3-word parsed message — one short but
        # perfectly parseable line must route to 'unrouted', not kill
        # the whole job (or permanently poison a streaming replay)
        from datetime import datetime
        rows = [
            ("c1", 0, "user", "Jan  1 12:34:56 host1 hi",
             None, datetime(2024, 1, 1, 12, 34, 56)),
            ("c1", 1, "assistant", "Jan  1 12:34:57 host1 app[2]: INFO ok",
             None, datetime(2024, 1, 1, 12, 34, 57)),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")
        cfg = PipelineConfig(out_dir="/tmp/unused-short", n_buckets=2,
                             partitions=2)
        got = {r["turn_idx"]: (r["sink"], r["severity"])
               for r in enriched_turns(spark, df, cfg).collect()}
        assert got[0] == ("unrouted", None)   # 1-word message, parsed ok
        assert got[1][1] == "INFO"            # 3+ words still routed


class TestSyntheticSkew:
    def test_zipf_tail_crosses_turn_chunk(self, spark):
        # the 1% huge bucket must actually produce conversations longer
        # than the pipeline's turn_chunk (4096), or the chunk-salted
        # repartition path is never exercised by any fixture or bench —
        # the old generator reused the bucket-selector hash as the
        # length, pinning "huge" to 3899-3998 turns
        from log2seq_spark.sources.transcripts import conversations
        conv = conversations(spark, 1200, seed=42)
        mx = conv.agg(F.max("conv_len")).first()[0]
        assert mx > PipelineConfig.turn_chunk, mx


class TestLineageSwitch:
    def test_manifest_wiped_with_data_on_lineage_switch(self, spark,
                                                        tmpdir_path):
        # switching lineages on a shared out_dir wipes the data dirs;
        # the OTHER lineage's manifest records must go too, or a later
        # run of that lineage "resumes" against deleted output and
        # reports success with zero rows
        from log2seq_spark.sources.transcripts import transcripts
        turns = transcripts(spark, 40, seed=21, partitions=2)
        out = tmpdir_path + "/lsw"
        c1 = PipelineConfig(out_dir=out, n_buckets=4, partitions=4,
                            input_id="L1")
        c2 = PipelineConfig(out_dir=out, n_buckets=4, partitions=4,
                            input_id="L2")
        r1 = run_pipeline(spark, turns, c1, resume=True)
        assert r1.metrics["n_rows"] > 0
        run_pipeline(spark, turns, c2, resume=True)   # wipes L1 data
        r1b = run_pipeline(spark, turns, c1, resume=True)
        assert r1b.buckets_processed == [0, 1, 2, 3]
        assert r1b.metrics["n_rows"] == r1.metrics["n_rows"]


class TestUriPathManifest:
    """The resume protocol on scheme-qualified out_dirs (hdfs://, s3a://)
    — exercised through file:// which routes through the same Hadoop
    FileSystem code path on local disk. Object stores have no reliable
    append, so URI paths commit one marker file per bucket under
    <out_dir>/manifest/ instead of appending to manifest.jsonl."""

    def test_full_run_resume_and_lineage_switch(self, spark, turns,
                                                tmpdir_path):
        uri = "file://" + tmpdir_path
        cfg = PipelineConfig(out_dir=uri, n_buckets=8, partitions=8)
        res1 = run_pipeline(spark, turns, cfg, resume=True)
        assert sorted(res1.buckets_processed) == list(range(8))
        assert res1.metrics["n_rows"] == turns.count()

        # per-record marker files, not a jsonl
        mdir = os.path.join(tmpdir_path, "manifest")
        # the Hadoop local FS adds .crc sidecars; the manifest reader
        # filters on the .json suffix, mirror that here
        names = sorted(n for n in os.listdir(mdir)
                       if not n.startswith("."))
        assert len(names) == 8
        assert all(n.startswith(res1.lineage_id) and n.endswith(".json")
                   for n in names)
        assert not os.path.exists(os.path.join(tmpdir_path,
                                               "manifest.jsonl"))

        # read_manifest sees the same record schema as the jsonl layout
        recs = mf.read_manifest(uri, spark=spark)
        assert len(recs) == 8
        assert all("lineage_id" in r and "n_rows" in r for r in recs)
        assert sum(r["n_rows"] for r in recs) == turns.count()

        # rerun resumes: everything skipped, output intact
        res2 = run_pipeline(spark, turns, cfg, resume=True)
        assert res2.buckets_processed == []
        assert sorted(res2.buckets_skipped) == list(range(8))
        routed = spark.read.parquet(os.path.join(tmpdir_path, "routed"))
        assert routed.count() == turns.count()

        # lineage switch wipes data AND the manifest dir through the FS
        # API, then reprocesses everything
        cfg_b = PipelineConfig(out_dir=uri, n_buckets=8, partitions=8,
                               input_id="inputB")
        res3 = run_pipeline(spark, turns, cfg_b, resume=True)
        assert sorted(res3.buckets_processed) == list(range(8))
        names_b = sorted(n for n in os.listdir(mdir)
                         if not n.startswith("."))
        assert names_b and all(n.startswith(res3.lineage_id)
                               for n in names_b)

    def test_uri_path_spark_resolution(self, spark, tmpdir_path,
                                       monkeypatch):
        # with an active session, spark= may be omitted (foreachBatch
        # closures rely on this); with none at all, URI-path I/O raises
        # with remediation instead of falling back to local open()
        assert mf.completed_buckets("file://" + tmpdir_path, "abc") == set()
        from pyspark.sql import SparkSession
        monkeypatch.setattr(SparkSession, "getActiveSession",
                            staticmethod(lambda: None))
        with pytest.raises(ValueError, match="filesystem scheme"):
            mf.completed_buckets("file://" + tmpdir_path, "abc")
        with pytest.raises(ValueError, match="filesystem scheme"):
            mf.append_bucket_records("file://" + tmpdir_path, "abc",
                                     [{"bucket": 0}])

    def test_recommit_same_bucket_is_idempotent(self, spark, tmpdir_path):
        uri = "file://" + tmpdir_path
        rec = {"bucket": 3, "n_rows": 10, "n_ok": 9, "n_fail": 1,
               "n_empty": 0, "n_tokens": 50}
        mf.append_bucket_records(uri, "deadbeefdeadbeef", [rec],
                                 spark=spark)
        mf.append_bucket_records(uri, "deadbeefdeadbeef", [rec],
                                 spark=spark)
        assert mf.completed_buckets(uri, "deadbeefdeadbeef",
                                    spark=spark) == {3}
        recs = mf.read_manifest(uri, spark=spark)
        assert len(recs) == 1 and recs[0]["n_rows"] == 10
