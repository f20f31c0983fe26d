"""Tool-call JSON argument parsing/validation (operators/toolargs.py)."""

import pytest

from log2seq_spark.operators import toolargs

ROWS = [
    # (conv, idx, tool, text)
    ("a", 1, "search", '{"q": "spark", "n": 3}'),
    ("a", 2, "search", '{"n": 5}'),              # missing required q
    ("a", 3, "calc", '{"expr": "1+1"}'),
    ("a", 4, "calc", '{"expr": "2*2", "prec": 4}'),
    ("b", 1, "search", '{"q": "logs"'),          # malformed
    ("b", 2, "fetch", '{"whatever": 1}'),        # tool with no schema
    ("b", 3, "calc", 'not json at all'),
]

REQUIRED = {"search": ["q"], "calc": ["expr"]}


@pytest.fixture(scope="module")
def validated(spark):
    df = spark.createDataFrame(ROWS, ["conv_id", "turn_idx", "tool", "text"])
    return toolargs.validate_required(toolargs.parse_args(df), REQUIRED)


class TestParseValidate:
    def test_valid_flags(self, validated):
        got = {(r["conv_id"], r["turn_idx"]): r for r in validated.collect()}
        assert got[("a", 1)]["args_valid"] and got[("a", 1)]["args_ok"]
        assert got[("a", 2)]["args_valid"] and not got[("a", 2)]["args_ok"]
        assert got[("a", 2)]["args_missing"] == ["q"]
        assert not got[("b", 1)]["args_valid"] and not got[("b", 1)]["args_ok"]
        assert got[("b", 1)]["args_missing"] == ["q"]
        # no schema for fetch -> valid JSON is enough
        assert got[("b", 2)]["args_ok"] and got[("b", 2)]["args_missing"] == []
        assert not got[("b", 3)]["args_valid"]

    def test_keys_extracted(self, validated):
        got = {(r["conv_id"], r["turn_idx"]): r for r in validated.collect()}
        assert sorted(got[("a", 1)]["args_keys"]) == ["n", "q"]
        assert got[("b", 1)]["args_keys"] is None


class TestStats:
    def test_tool_call_stats(self, validated):
        st = {r["tool"]: r
              for r in toolargs.tool_call_stats(
                  validated, numeric_path="$.n").collect()}
        assert st["search"]["n_calls"] == 3
        assert st["search"]["n_valid_json"] == 2
        assert st["search"]["n_ok"] == 1
        assert st["search"]["sum_num"] == 3.0   # only the ok row's n
        assert st["calc"]["n_ok"] == 2 and st["calc"]["sum_num"] == 0.0

    def test_arg_key_census(self, validated):
        cen = {(r["tool"], r["arg_key"]): r["n"]
               for r in toolargs.arg_key_census(validated).collect()}
        assert cen[("search", "q")] == 1      # only fully-valid payloads
        assert cen[("search", "n")] == 2
        assert cen[("calc", "expr")] == 2
        assert ("calc", "prec") in cen and cen[("calc", "prec")] == 1
        assert not any(t == "calc" and k == "q" for t, k in cen)
