"""Unicode hygiene: NFC normalization + control/zero-width stripping."""

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import scrub


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id long, text string")


class TestNormalizeText:
    def test_nfc_composes_decomposed_accents(self, spark):
        decomposed = "café"            # e + combining acute
        out = scrub.normalize_text(_docs(spark, [decomposed, "café"]))
        rows = sorted(out.collect(), key=lambda r: r["doc_id"])
        assert rows[0]["norm_text"] == "café"
        assert rows[0]["changed"] is True
        assert rows[1]["norm_text"] == "café"
        assert rows[1]["changed"] is False

    def test_controls_and_zero_width_stripped(self, spark):
        dirty = "a\x01b​c﻿d"
        out = scrub.normalize_text(_docs(spark, [dirty])).first()
        assert out["norm_text"] == "abcd"
        assert out["n_controls"] == 3
        assert out["changed"] is True

    def test_whitespace_survives(self, spark):
        keep = "line1\nline2\ttabbed\r"
        out = scrub.normalize_text(_docs(spark, [keep])).first()
        assert out["norm_text"] == keep
        assert out["n_controls"] == 0
        assert out["changed"] is False

    def test_null_text_passes_through(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        out = scrub.normalize_text(df).first()
        assert out["norm_text"] is None


class TestNormalizeStats:
    def test_census(self, spark):
        docs = _docs(spark, ["café",       # nfc-changed, 4 cp after
                             "ok\x00\x01",       # 2 controls, 2 cp after
                             "plain"])           # untouched, 5 cp
        rows = {r["kind"]: r for r in
                scrub.normalize_stats(docs).collect()}
        c = rows["controls"]
        assert (c["n_matches"], c["n_docs"], c["n_after"]) == (2, 1, 0)
        n = rows["nfc"]
        assert n["n_matches"] == 2     # accent doc + control doc changed
        assert n["n_docs"] == 3
        assert n["n_after"] == 4 + 2 + 5
