"""logfmt parsing tests — pure built-in expression plan (no Python),
keep-last duplicate semantics, quote/escape handling, null/empty
propagation, and the one-regex-scan staging discipline."""

import pytest

from log2seq_spark.functions.logfmt import (logfmt_entries_expr,
                                            with_logfmt)


def _parse(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    r = with_logfmt(df, **kw).collect()[0]
    return None if r["logfmt"] is None else dict(r["logfmt"])


class TestLogfmt:
    def test_basic_pairs(self, spark):
        assert _parse(spark, "level=info n=42 dur=1.5ms") == {
            "level": "info", "n": "42", "dur": "1.5ms"}

    def test_quoted_values_with_spaces_and_escapes(self, spark):
        assert _parse(spark, r'msg="hello world" q="a \" b" x="a=b c=d"') == {
            "msg": "hello world", "q": 'a " b', "x": "a=b c=d"}

    def test_duplicate_keys_keep_last(self, spark):
        assert _parse(spark, "level=warn level=error level=fatal n=1") == {
            "level": "fatal", "n": "1"}

    def test_empty_value_and_flag_tokens(self, spark):
        # key= keeps an empty value; a bare flag word has no '=' and is
        # NOT minted into an entry (consumers disagree; inventing
        # key->"" would fabricate data)
        assert _parse(spark, "empty= flag level=info") == {
            "empty": "", "level": "info"}

    def test_no_pairs_empty_map_null_text_null_map(self, spark):
        assert _parse(spark, "just words, no pairs") == {}
        assert _parse(spark, None) is None

    def test_key_charset(self, spark):
        assert _parse(spark, "a.b=1 c-d=2 e/f=3 _g=4 9bad=5") == {
            "a.b": "1", "c-d": "2", "e/f": "3", "_g": "4"}

    def test_lifted_key_columns(self, spark):
        df = spark.createDataFrame(
            [("level=info msg=up",), ("n=1",)], "text string")
        rows = with_logfmt(df, keys=["level", "msg"]).collect()
        got = {r["text"]: (r["level"], r["msg"]) for r in rows}
        assert got == {"level=info msg=up": ("info", "up"),
                       "n=1": (None, None)}

    def test_entries_preserve_order_and_duplicates(self, spark):
        from pyspark.sql import functions as F
        df = spark.createDataFrame([("a=1 b=2 a=3",)], "text string")
        rows = df.select(
            logfmt_entries_expr(F.col("text")).alias("e")).collect()[0]["e"]
        assert [(e["key"], e["value"]) for e in rows] == [
            ("a", "1"), ("b", "2"), ("a", "3")]

    def test_internal_column_collision_raises(self, spark):
        df = spark.createDataFrame(
            [("x=1", "boom")], "text string, __logfmt_entries string")
        with pytest.raises(ValueError, match="__logfmt_entries"):
            with_logfmt(df)

    def test_bounded_regex_scans_in_plan(self, spark):
        # staging discipline: exactly TWO tokenizing scans (key group +
        # value group — the split that keeps the per-element lambda
        # free of ltrim/instr/substring splitting), and the count must
        # NOT grow with the number of lifted keys (captured expression
        # trees re-evaluate per lambda element — the repetition_stats
        # lesson)
        df = spark.createDataFrame([("a=1 b=2 c=3",)], "text string")
        plan1 = with_logfmt(df, keys=["a"]) \
            ._jdf.queryExecution().executedPlan().toString()
        plan3 = with_logfmt(df, keys=["a", "b", "c"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan1.count("regexp_extract_all") == 2
        assert plan3.count("regexp_extract_all") == 2

    def test_matches_pure_python_model(self, spark):
        # randomized (seeded) corpus vs an independent pure-Python
        # logfmt parser implementing the same spec
        import random
        import re as _re
        rng = random.Random(11)
        keys = ["level", "msg", "n", "dur", "a.b", "x-y"]
        vals = ["info", "warn", "1.5ms", "42", "", "a b c", 'q"t', "a=b"]
        lines = []
        for _ in range(200):
            toks = []
            for _ in range(rng.randrange(6)):
                k, v = rng.choice(keys), rng.choice(vals)
                if " " in v or "=" in v or '"' in v:
                    toks.append(f'{k}="{v.replace(chr(92), chr(92)*2).replace(chr(34), chr(92) + chr(34))}"')
                else:
                    toks.append(f"{k}={v}")
                if rng.random() < 0.2:
                    toks.append(rng.choice(["flag", "loose!", "::"]))
            lines.append(" ".join(toks))

        pair_re = _re.compile(
            r'(?:^|\s)[A-Za-z_][A-Za-z0-9_.\-/]*='
            r'(?:"(?:[^"\\]|\\.)*"|[^\s"]*)')

        def model(text):
            out = {}
            for tok in pair_re.findall(text):
                k, v = tok.lstrip().split("=", 1)
                if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
                    v = _re.sub(r"\\(.)", r"\1", v[1:-1])
                out[k] = v
            return out

        df = spark.createDataFrame([(t,) for t in lines], "text string")
        rows = with_logfmt(df).collect()
        for r in rows:
            assert dict(r["logfmt"]) == model(r["text"]), r["text"]


class TestUniqueKeysFastPath:
    def test_equal_to_keeplast_on_unique_keys(self, spark):
        from log2seq_spark.functions.logfmt import with_logfmt
        df = spark.createDataFrame(
            [('a=1 b="x y" c=',), ("",), (None,), ("no pairs here",)],
            "text string")
        slow = {r["text"]: r["m"] for r in
                with_logfmt(df, out_col="m").collect()}
        fast = {r["text"]: r["m"] for r in
                with_logfmt(df, out_col="m", unique_keys=True).collect()}
        assert fast == slow

    def test_duplicate_key_raises_loudly(self, spark):
        import pytest
        from log2seq_spark.functions.logfmt import with_logfmt
        df = spark.createDataFrame([("a=1 a=2",)], "text string")
        with pytest.raises(Exception, match="DUPLICATED_MAP_KEY|duplicate"):
            with_logfmt(df, out_col="m", unique_keys=True).collect()

    def test_no_hof_filter_in_fast_plan(self, spark):
        # the fast path must not carry the O(pairs^2) keep-last filter
        from log2seq_spark.functions.logfmt import with_logfmt
        df = spark.createDataFrame([("a=1",)], "text string")
        plan = with_logfmt(df, out_col="m", unique_keys=True) \
            ._jdf.queryExecution().optimizedPlan().toString()
        assert "exists(" not in plan and "filter(" not in plan.replace(
            "Filter (", "")
