"""Property-based tests (Hypothesis): for RANDOM statements and RANDOM
action pipelines, the vectorized tokenizer equals the pure oracle and the
reconstruction invariant holds. Goes beyond the reference's golden-value
suite (SURVEY.md §5)."""

import string as _string

import pandas as pd
from hypothesis import given, settings, strategies as st

from log2seq_spark.rules import (compile_actions, tokenize_statement,
                                 split, fix, fix_ip, remove, fix_partial,
                                 fix_parenthesis, remove_partial,
                                 conditional_split)
from log2seq_spark.functions import VectorTokenizer
from log2seq_spark.rules.presets import default_program

# statement alphabet: letters, digits, the preset separators, quotes,
# ip-ish punctuation, unicode extras (exercises the non-ASCII fallback)
_ALPHABET = (_string.ascii_letters + _string.digits +
             ' ()[]{}|+\',=><;`#:./-"%' + "éß日")

statements = st.text(alphabet=_ALPHABET, min_size=0, max_size=80)

action_pool = st.sampled_from([
    split(" "), split(' ()[]{}|+\',=><;`# "'), split(":"), split(" .,"),
    fix_ip(),
    fix([r"^\d{2}:\d{2}:\d{2}(\.\d+)?$", r"^([0-9a-fA-F]{2}:){5}[0-9a-fA-F]{2}$"]),
    fix(r"\d+\.\d+"),
    remove(r"^[^a-zA-Z0-9]+$"),
    fix_partial(r'^(?P<ip>(\d{1,3}\.){3}\d{1,3})\.(?P<port>\d{1,5})$',
                fix_groups=["ip", "port"]),
    fix_parenthesis(['"', '"']),
    fix_parenthesis(['(', ')'], recursive=True),
    remove_partial(r'^.*[^:](?P<colon>:)$', remove_groups=["colon"]),
    conditional_split(r'^%[A-Z]+-\d+$', r'%-'),
])

pipelines = st.lists(action_pool, min_size=1, max_size=5)


@settings(max_examples=150, deadline=None)
@given(lines=st.lists(statements, min_size=1, max_size=8), acts=pipelines)
def test_vectorized_equals_oracle_and_reconstructs(lines, acts):
    compiled = compile_actions(acts)
    vt = VectorTokenizer(acts)
    vw, vs = vt.run(pd.Series(lines, dtype=object))
    for i, line in enumerate(lines):
        ew, es = tokenize_statement(compiled, line)
        assert vw[i] == ew, (line, acts)
        assert vs[i] == es, (line, acts)
        assert len(vs[i]) == len(vw[i]) + 1
        rebuilt = vs[i][0] + "".join(w + s for w, s in zip(vw[i], vs[i][1:]))
        assert rebuilt == line


@settings(max_examples=200, deadline=None)
@given(text=st.text(alphabet=_ALPHABET + "\t\n", min_size=0, max_size=80))
def test_bpe_pattern_identical_across_regex_engines(text):
    """The BPE-ish token count must be identical under Python re
    (leftmost-first, like Java regex on the Spark side) and RE2 (DuckDB,
    the oracle side) — the cross-engine equivalence the oracle gate
    relies on, stressed over adversarial random text incl. unicode."""
    import re

    import duckdb

    from log2seq_spark.operators.textstats import BPE_ISH_PATTERN
    n_py = len(re.compile(BPE_ISH_PATTERN).findall(text))
    con = duckdb.connect()
    n_duck = con.execute(
        "SELECT len(regexp_extract_all(?, ?))",
        [text, BPE_ISH_PATTERN]).fetchone()[0]
    con.close()
    assert n_py == n_duck, text


header_lines = st.text(alphabet=_ALPHABET + "\t", min_size=0, max_size=100)


@settings(max_examples=100, deadline=None)
@given(lines=st.lists(header_lines, min_size=1, max_size=6))
def test_header_cascade_never_crashes_and_agrees(lines):
    from log2seq_spark.functions import BatchParser
    from log2seq_spark.rules import LineEngine, ParseFailure
    bp = BatchParser(default_program())
    oracle = LineEngine(default_program(), default_year=2024)
    out = bp.parse(pd.Series(lines, dtype=object),
                   default_year=pd.Series([2024.0] * len(lines)))
    for i, line in enumerate(lines):
        row = out.iloc[i]
        try:
            exp = oracle.parse_line(line)
        except ParseFailure:
            assert row["rule_id"] == -1
            continue
        except ValueError:
            assert row["error"] is not None
            continue
        if exp is None:
            assert row["rule_id"] == -2
            continue
        assert row["message"] == exp["message"], line
        assert row["words"] == exp["words"], line
        assert row["symbols"] == exp["symbols"], line


class TestLogTailProperty:
    def test_batched_tail_reconstructs_file(self, tmpdir_path):
        """Property: for ANY sequence of appends (arbitrary chunk
        boundaries, with/without trailing newline), concatenating the
        emitted batch texts equals the file's complete lines, each
        exactly once, in order."""
        import os
        import random
        from log2seq_spark.sources.logfiles import LogTailStreamReader
        rng = random.Random(123)
        log = os.path.join(tmpdir_path, "t.log")
        open(log, "w").close()
        reader = LogTailStreamReader({"path": log})
        off = reader.initialOffset()
        emitted = []
        payload = ""
        for _ in range(30):
            chunk = "".join(rng.choice("ab\n") for _ in range(rng.randint(1, 9)))
            payload += chunk
            with open(log, "a") as f:
                f.write(chunk)
            rows, off = reader.read(off)
            emitted.extend(t for (_, _, t) in rows)
        complete = payload[:payload.rfind("\n") + 1] if "\n" in payload else ""
        assert emitted == complete.split("\n")[:-1]
        # line numbers must be gapless and 1-based
        rows, _ = reader.read(reader.initialOffset())
        assert [n for (_, n, _) in rows] == list(range(1, len(emitted) + 1))
