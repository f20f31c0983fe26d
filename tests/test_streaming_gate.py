"""Per-micro-batch data-quality admission gate on the streaming route
(``streaming_gated_route``): clean batches admitted, violating batches
diverted whole to quarantine with a persisted report."""

import json
import os

import pytest
from pyspark.sql import functions as F

from log2seq_spark import fsio
from log2seq_spark.operators import expectations as ex
from log2seq_spark.streaming import streaming_gated_route

SCHEMA = "conv_id string, turn_idx int, sink string"


class TestStreamingGate:
    def _run(self, spark, inp, out, quar, ckpt):
        stream = spark.readStream.schema(SCHEMA).parquet(inp)
        checks = [ex.not_null("conv_id"), ex.in_range("turn_idx", lo=0)]
        q = (streaming_gated_route(stream, out, ckpt, checks, quar)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    def test_admit_then_quarantine(self, spark, tmpdir_path):
        inp = os.path.join(tmpdir_path, "in")
        out = os.path.join(tmpdir_path, "out")
        quar = os.path.join(tmpdir_path, "quar")
        ckpt = os.path.join(tmpdir_path, "ckpt")

        clean = spark.createDataFrame(
            [(f"c{i}", i, "info-chat") for i in range(200)], SCHEMA)
        clean.write.mode("append").parquet(inp)
        self._run(spark, inp, out, quar, ckpt)
        admitted = spark.read.parquet(out)
        assert admitted.count() == 200
        assert "batch_id" in admitted.columns
        assert not os.path.exists(quar)

        # second drop is poisoned: null conv_ids + a negative turn_idx
        poison = spark.createDataFrame(
            [(None, 1, "info-chat"), ("c9", -3, "warn-chat"),
             ("ok", 2, "info-chat")], SCHEMA)
        poison.write.mode("append").parquet(inp)
        self._run(spark, inp, out, quar, ckpt)

        # good sink untouched; poison batch intact under its batch_id
        assert spark.read.parquet(out).count() == 200
        qdf = spark.read.parquet(quar)
        assert qdf.count() == 3
        bids = [r["batch_id"] for r in
                qdf.select("batch_id").distinct().collect()]
        assert len(bids) == 1

        # report names both violated checks, next to the data
        report = json.loads(fsio.read_text(
            spark, f"{quar}/_reports/batch-{bids[0]}.json"))
        failed = {r["check"] for r in report if not r["passed"]}
        assert failed == {"not_null(conv_id)", "in_range(turn_idx)"}

        # a third clean drop is admitted again — the stream never died
        more = spark.createDataFrame(
            [(f"d{i}", i, "warn-chat") for i in range(50)], SCHEMA)
        more.write.mode("append").parquet(inp)
        self._run(spark, inp, out, quar, ckpt)
        assert spark.read.parquet(out).count() == 250
