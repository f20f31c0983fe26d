"""streaming_substr_scrub: cross-run unbounded-horizon scrub must
equal the batch recompute, and the epoch index must carry the merged
gram counts."""

import glob
import os

from pyspark.sql import functions as F

from log2seq_spark.operators import substrdedup as sd
from log2seq_spark.streaming import streaming_substr_scrub


class TestStreamingSubstr:
    def _run(self, spark, inp, out, ck, ix, rows, schema):
        (spark.createDataFrame(rows, schema)
              .coalesce(1).write.mode("append").parquet(inp))
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (streaming_substr_scrub(stream, out, ck, ix, k=3)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    def test_cross_run_equals_batch(self, spark, tmpdir_path):
        inp = os.path.join(tmpdir_path, "sin")
        out = os.path.join(tmpdir_path, "sout")
        ck = os.path.join(tmpdir_path, "sck")
        ix = os.path.join(tmpdir_path, "six")
        schema = "doc_id string, text string"
        run = "s1 s2 s3 s4"
        r1 = [("a0", f"{run} u0"), ("a1", f"u1 {run}")]
        r2 = [("z0", f"{run} u2"), ("z1", "fresh text here u3")]
        self._run(spark, inp, out, ck, ix, r1, schema)
        self._run(spark, inp, out, ck, ix, r2, schema)

        got = {r["doc_id"]: (r["text"], r["n_dropped_tokens"])
               for r in spark.read.parquet(out).collect()}
        # ids order a* < z* and arrival order matches, so the stream
        # must equal one batch scrub over everything ingested
        want = {r["doc_id"]: (r["text"], r["n_dropped_tokens"])
                for r in sd.scrub_duplicate_spans(
                    spark.createDataFrame(r1 + r2, schema),
                    k=3).collect()}
        assert got == want
        assert got["a0"] == (f"{run} u0", 0)     # keeper survives
        assert got["z0"] == ("u2", 4)            # cross-run scrub

        # newest epoch index == from-scratch gram index
        latest = sorted(glob.glob(os.path.join(ix, "epoch=*")),
                        key=lambda p: int(p.rsplit("=", 1)[1]))[-1]
        got_idx = {(r["gh"], r["n_occ"])
                   for r in spark.read.parquet(latest).collect()}
        want_idx = {(r["gh"], r["n_occ"])
                    for r in sd.substr_index(
                        spark.createDataFrame(r1 + r2, schema),
                        k=3).collect()}
        assert got_idx == want_idx

    def test_param_drift_refused_across_restart(self, spark,
                                                tmpdir_path):
        import pytest
        inp = os.path.join(tmpdir_path, "din")
        out = os.path.join(tmpdir_path, "dout")
        ix = os.path.join(tmpdir_path, "dix")
        schema = "doc_id string, text string"
        self._run(spark, inp, out, os.path.join(tmpdir_path, "dck1"),
                  ix, [("a", "x y z w")], schema)

        # same state dir, different k -> the guard must refuse
        (spark.createDataFrame([("b", "p q r s")], schema)
              .coalesce(1).write.mode("append").parquet(inp))
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (streaming_substr_scrub(
                stream, out, os.path.join(tmpdir_path, "dck2"), ix,
                k=4)
             .trigger(availableNow=True).start())
        with pytest.raises(Exception, match="[Pp]aram"):
            q.awaitTermination(120)
