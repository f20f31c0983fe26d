"""Property-based tests (Hypothesis): for RANDOM statements and RANDOM
action pipelines, the vectorized tokenizer equals the pure oracle and the
reconstruction invariant holds. Goes beyond the reference's golden-value
suite (SURVEY.md §5)."""

import string as _string
import sys

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


class TestRandomHeaderProgramParity:
    """Fuzz RANDOM header rule programs (random item sequences, random
    separators, optional flags) against the ACTUAL reference library:
    for every generated program both engines must be constructible, and
    for every line (well-formed or corrupted) `LineEngine.parse_line`
    must agree with reference `LogParser.process_line` — same
    success/failure, same message/words/symbols, same extracted fields,
    same timestamp. Goes beyond the fixed-preset corpus parity tests
    (reference header.py:198-333 synthesis semantics under arbitrary
    programs)."""

    N_PROGRAMS = 220

    @staticmethod
    def _pool(rng):
        """Paired (ours, reference, sample) item generators. `sample`
        returns text that matches the item's pattern."""
        sys.path.insert(0, "/root/reference")
        from log2seq.header import (Digit, String, Hostname, UserItem,
                                    MonthAbbreviation, Time, Date,
                                    YearWithoutCentury, DatetimeISOFormat,
                                    UnixTime, TimeZone, DemicalSecond,
                                    DateConcat, TimeConcat)
        from log2seq_spark.rules import (digit, string, hostname,
                                         user_field, month_abbr,
                                         time_of_day, date, year2)
        from log2seq_spark.rules.spec import (MONTH_ABBREVIATIONS,
                                              iso_datetime, unixtime,
                                              tzone, dsecond,
                                              date_concat, time_concat)

        words = ["alpha", "beta", "gamma", "delta", "kern", "sshd", "su"]
        # (key, needs_name, ours_factory, ref_factory, sampler)
        return [
            ("digit", True, digit, Digit,
             lambda: str(rng.randrange(0, 100000))),
            ("string", True, string, String,
             lambda: rng.choice(words) + str(rng.randrange(10))),
            ("hostname", True, hostname, Hostname,
             lambda: f"h{rng.randrange(20)}.example.org"),
            ("user", True,
             lambda nm, **kw: user_field(nm, r"[A-Z]{2,4}", **kw),
             lambda nm, **kw: UserItem(nm, r"[A-Z]{2,4}", **kw),
             lambda: "".join(rng.choice("ABCDEFG")
                             for _ in range(rng.randrange(2, 5)))),
            ("month_abbr", False, month_abbr, MonthAbbreviation,
             lambda: rng.choice(MONTH_ABBREVIATIONS)),
            ("time", False, time_of_day, Time,
             lambda: "%02d:%02d:%02d" % (rng.randrange(24),
                                         rng.randrange(60),
                                         rng.randrange(60))),
            ("date", False, date, Date,
             lambda: "%04d-%02d-%02d" % (2000 + rng.randrange(30),
                                         1 + rng.randrange(12),
                                         1 + rng.randrange(28))),
            ("year2", False, year2, YearWithoutCentury,
             lambda: "%02d" % rng.randrange(100)),
            ("iso_dt", False, iso_datetime, DatetimeISOFormat,
             lambda: "%04d-%02d-%02dT%02d:%02d:%02d%s%s" % (
                 2000 + rng.randrange(30), 1 + rng.randrange(12),
                 1 + rng.randrange(28), rng.randrange(24),
                 rng.randrange(60), rng.randrange(60),
                 rng.choice(["", ".%06d" % rng.randrange(10**6)]),
                 rng.choice(["", "Z", "+09:00", "-05:30"]))),
            ("unixtime", False, unixtime, UnixTime,
             lambda: str(rng.randrange(1_500_000_000, 1_800_000_000))),
            ("tzone", False, tzone, TimeZone,
             lambda: rng.choice(["Z", "+0900", "-0500", "+09:00"])),
            ("dsecond", False, dsecond, DemicalSecond,
             lambda: str(rng.randrange(0, 10**6))),
            ("date_concat", False, date_concat, DateConcat,
             lambda: "%04d%02d%02d" % (2000 + rng.randrange(30),
                                       1 + rng.randrange(12),
                                       1 + rng.randrange(28))),
            ("time_concat", False, time_concat, TimeConcat,
             lambda: "%02d%02d%02d" % (rng.randrange(24),
                                       rng.randrange(60),
                                       rng.randrange(60))),
        ]

    def _random_program(self, rng):
        """One random program + matching-line samplers for it. Returns
        (ours_engine, ref_parser, line_maker) or None when either side
        rejects the program (both must reject — asserted)."""
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from log2seq.header import HeaderParser, Statement
        from log2seq import LogParser
        from log2seq import preset as ref_preset
        from log2seq_spark.rules import (RuleProgram, HeaderRule,
                                         LineEngine, statement)
        from log2seq_spark.rules.presets import default_actions

        from log2seq.header import ItemGroup
        from log2seq_spark.rules.spec import group

        pool = self._pool(rng)
        n_items = rng.randrange(1, 6)
        used_fixed = set()
        ours_fields, ref_items, samplers = [], [], []

        def pick(i, sub):
            """One leaf item pair or None (fixed-name collision)."""
            key, needs_name, mk_ours, mk_ref, sample = rng.choice(pool)
            if not needs_name:
                if key in used_fixed:
                    return None       # fixed match names must be unique
                used_fixed.add(key)
            optional = (not sub) and rng.random() < 0.2
            if needs_name:
                nm = f"f{i}"
                return (mk_ours(nm, optional=optional),
                        mk_ref(nm, optional=optional), sample, optional)
            return (mk_ours(optional=optional),
                    mk_ref(optional=optional), sample, optional)

        for i in range(n_items):
            if rng.random() < 0.25:
                # nested ItemGroup with its OWN separator (exercises the
                # recursive make_pattern_separator synthesis + group pick)
                gsep = rng.choice([" ", " :", "/", " -"])
                members = [m for m in
                           (pick(f"{i}g{j}", sub=True) for j in range(
                               rng.randrange(1, 4))) if m is not None]
                if not members:
                    continue
                g_optional = rng.random() < 0.3
                ours_fields.append(group(
                    [m[0] for m in members], separator=gsep,
                    optional=g_optional))
                ref_items.append(ItemGroup(
                    [m[1] for m in members], separator=gsep,
                    optional=g_optional))
                gchars = list(gsep)

                def g_sample(ms=members, gc=gchars):
                    glue = lambda: "".join(rng.choice(gc) for _ in
                                           range(rng.randrange(1, 3)))
                    out = ms[0][2]()
                    for m in ms[1:]:
                        out += glue() + m[2]()
                    return out
                samplers.append((g_sample, g_optional))
                continue
            m = pick(i, sub=False)
            if m is None:
                continue
            ours_fields.append(m[0])
            ref_items.append(m[1])
            samplers.append((m[2], m[3]))
        ours_fields.append(statement())
        ref_items.append(Statement())
        sep = rng.choice([" ", " :", " :[]", " ,", " =/", " :[]<>"])
        defaults = {}
        if "year2" not in used_fixed and "date" not in used_fixed:
            defaults["year"] = 2024

        err_ours = err_ref = None
        try:
            rule = HeaderRule(fields=tuple(ours_fields), separator=sep,
                              defaults=tuple(defaults.items()))
            eng = LineEngine(RuleProgram((rule,), default_actions()))
        except Exception as e:          # noqa: BLE001 — parity check
            err_ours, eng = e, None
        try:
            hp = HeaderParser(ref_items, separator=sep, defaults=defaults)
            ref = LogParser(hp, ref_preset.default_statement_parser())
        except Exception as e:          # noqa: BLE001 — parity check
            err_ref, ref = e, None
        # construction parity: both accept or both reject
        assert (err_ours is None) == (err_ref is None), (err_ours, err_ref)
        if err_ours is not None:
            return None

        sep_chars = [c for c in sep]

        def line_maker():
            parts = []
            for sample, optional in samplers:
                if optional and rng.random() < 0.3:
                    continue
                parts.append(sample())
            stmt = " ".join(rng.choice(["ok", "failed", "x=1", "(a)", "9.9"])
                            for _ in range(rng.randrange(1, 5)))
            parts.append(stmt)
            glue = lambda: "".join(rng.choice(sep_chars)
                                   for _ in range(rng.randrange(1, 3)))
            line = parts[0]
            for p in parts[1:]:
                line += glue() + p
            if rng.random() < 0.3:      # corrupt: failure-path agreement
                cut = rng.randrange(len(line) + 1)
                line = ("!!" + line) if rng.random() < 0.5 else line[:cut]
            return line

        return eng, ref, line_maker

    def test_random_programs_agree_with_reference(self):
        import random
        rng = random.Random(20260817)
        n_checked = n_lines_ok = 0
        while n_checked < self.N_PROGRAMS:
            built = self._random_program(rng)
            n_checked += 1
            if built is None:
                continue
            eng, ref, line_maker = built
            for _ in range(6):
                line = line_maker()
                if line == "":
                    continue
                try:
                    exp = ref.process_line(line)
                except Exception:       # noqa: BLE001 — failure parity
                    exp = None
                try:
                    got = eng.parse_line(line)
                except Exception:       # noqa: BLE001 — failure parity
                    got = None
                if exp is None:
                    assert got is None, (line, got)
                    continue
                assert got is not None, (line, exp)
                assert got.get("message") == exp.get("message"), line
                assert got.get("words") == exp.get("words"), line
                assert got.get("symbols") == exp.get("symbols"), line
                for k, v in exp.items():
                    if k in ("message", "words", "symbols", "timestamp"):
                        continue
                    assert got.get(k) == v, (k, line)
                if "timestamp" in exp:
                    e_ts = exp["timestamp"]
                    g_ts = got.get("timestamp")
                    if (g_ts is not None and g_ts.tzinfo is None
                            and e_ts.tzinfo is not None):
                        e_ts = e_ts.replace(tzinfo=None)
                    assert g_ts == e_ts, (line, g_ts, exp["timestamp"])
                n_lines_ok += 1
        # the fuzz must actually exercise the success path, not just
        # trade Nones: require a healthy parsed-line count (measured 330
        # at this seed — the rest are deliberate corruptions and
        # timestamp-assembly failures, which test failure agreement)
        assert n_lines_ok > 250, n_lines_ok


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


class TestCorpusDedupProperty:
    """Randomized equivalence of the corpus-level dedup operators
    against direct pure-Python models: whatever the corpus, the Spark
    plans must reproduce the declared keeper/coverage semantics
    exactly."""

    @staticmethod
    def _random_corpus(rng, n_docs):
        # small shared vocab + deliberately re-used lines so cross-doc
        # duplicates are common; blank lines and trailing newlines mixed in
        pool = [f"line {w} {x}" for w in ("aa", "bb", "cc", "dd")
                for x in range(4)]
        docs = []
        for i in range(n_docs):
            n = rng.randint(0, 6)
            lines = [rng.choice(pool + ["", f"solo {i} {j}"])
                     for j in range(n)]
            docs.append((i, "\n".join(lines)))
        return docs

    def test_line_dedup_matches_python_model(self, spark):
        import random
        from collections import Counter
        from log2seq_spark.operators import dedup
        rng = random.Random(77)
        for trial in range(5):
            rows = self._random_corpus(rng, rng.randint(2, 12))
            docs = spark.createDataFrame(rows, "doc_id long, text string")

            # model: ownership of each non-empty line
            owner, ndocs = {}, Counter()
            for i, t in rows:
                for ln in set(t.split("\n")):
                    if ln != "":
                        ndocs[ln] += 1
                        owner.setdefault(ln, i)
            exp_stats, exp_clean = {}, {}
            for i, t in rows:
                lines = t.split("\n")
                exp_stats[i] = (
                    len(lines),
                    sum(1 for ln in lines if ln != "" and ndocs[ln] > 1))
                exp_clean[i] = "\n".join(
                    ln for ln in lines
                    if ln == "" or ndocs[ln] == 1 or owner[ln] == i)

            got_stats = {r["doc_id"]: (r["n_lines"], r["n_corpus_dup_lines"])
                         for r in dedup.line_dedup_stats(docs).collect()}
            got_clean = {r["doc_id"]: r["clean_text"]
                         for r in dedup.drop_duplicate_lines(docs).collect()}
            assert got_stats == exp_stats, trial
            assert got_clean == exp_clean, trial

    def test_span_dedup_matches_python_model(self, spark):
        import random
        from log2seq_spark.operators import dedup
        rng = random.Random(99)
        k = 4
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        for trial in range(5):
            rows = []
            for i in range(rng.randint(2, 10)):
                n = rng.randint(0, 14)
                rows.append((i, " ".join(rng.choice(vocab)
                                         for _ in range(n))))
            docs = spark.createDataFrame(rows, "doc_id long, text string")

            toks = {i: [w for w in t.split(" ") if w] for i, t in rows}
            owner, ndocs = {}, {}
            for i, w in toks.items():
                for p in range(len(w) - k + 1):
                    win = tuple(w[p:p + k])
                    ndocs.setdefault(win, set()).add(i)
                    owner[win] = min(owner.get(win, i), i)
            exp = {}
            exp_clean = {}
            for i, w in toks.items():
                covered = set()
                dup_pos = []
                for p in range(len(w) - k + 1):
                    win = tuple(w[p:p + k])
                    if len(ndocs[win]) > 1 and owner[win] != i:
                        dup_pos.append(p)
                        covered.update(range(p, p + k))
                spans = sum(1 for j, p in enumerate(dup_pos)
                            if j == 0 or p > dup_pos[j - 1] + k - 1)
                exp[i] = (len(w), max(len(w) - k + 1, 0),
                          len(dup_pos), spans, len(covered))
                exp_clean[i] = " ".join(
                    t for p, t in enumerate(w) if p not in covered)
            got = {r["doc_id"]: (r["n_toks"], r["n_windows"],
                                 r["n_dup_windows"], r["n_spans"],
                                 r["dup_tokens"])
                   for r in dedup.duplicate_span_stats(docs, k=k).collect()}
            got_clean = {r["doc_id"]: r["clean_text"]
                         for r in dedup.drop_duplicate_spans(
                             docs, k=k).collect()}
            assert got == exp, trial
            assert got_clean == exp_clean, trial


class TestConversationHashProperty:
    def test_partition_and_row_order_invariance(self, spark):
        """Property: the conversation hash depends only on the ordered
        (role, text) sequence — never on row order or partitioning —
        and distinct sequences get distinct hashes."""
        import random
        from log2seq_spark.operators import dedup
        rng = random.Random(31)
        convs = {}
        for c in range(12):
            n = rng.randint(1, 6)
            convs[f"c{c}"] = [
                (i, rng.choice(["user", "assistant", "tool"]),
                 rng.choice(["hi", "ok", "run it", "done", None]))
                for i in range(n)]
        rows = [(cid, i, r, t)
                for cid, turns in convs.items() for (i, r, t) in turns]
        schema = "conv_id string, turn_idx int, role string, text string"

        base = {r["conv_id"]: r["conv_hash"]
                for r in dedup.conversation_hashes(
                    spark.createDataFrame(rows, schema)).collect()}
        for trial in range(3):
            rng.shuffle(rows)
            got = {r["conv_id"]: r["conv_hash"]
                   for r in dedup.conversation_hashes(
                       spark.createDataFrame(rows, schema)
                            .repartition(rng.randint(2, 7))).collect()}
            assert got == base, trial
        # distinct sequences -> distinct hashes (collision would need
        # md5 breakage at these sizes)
        seqs = {}
        for cid, turns in convs.items():
            seqs.setdefault(tuple((r, t) for _, r, t in turns), []).append(cid)
        for group in seqs.values():
            assert len({base[c] for c in group}) == 1
        assert len({base[c] for cs in seqs.values() for c in cs[:1]}) \
            == len(seqs)


class TestRandomActionPipelineReferenceParity:
    """Fuzz random ACTION pipelines against the ACTUAL reference
    StatementParser: for every generated pipeline, both our pure oracle
    (tokenize_statement) and the vectorized batch tokenizer must return
    the reference's exact (words, symbols) on random statements — the
    statement-side twin of TestRandomHeaderProgramParity (reference
    statement.py:87-113 process_line over all 8 action classes)."""

    N_PIPELINES = 120

    @staticmethod
    def _action_pairs():
        sys.path.insert(0, "/root/reference")
        from log2seq import statement as rs

        ip_pat = r'^(?P<ip>(\d{1,3}\.){3}\d{1,3})\.(?P<port>\d{1,5})$'
        colon_pat = r'^.*[^:](?P<colon>:)$'
        return [
            lambda: (split(" "), rs.Split(" ")),
            lambda: (split(' ()[]{}|+\',=><;`# "'),
                     rs.Split(' ()[]{}|+\',=><;`# "')),
            lambda: (split(":."), rs.Split(":.")),
            lambda: (fix_ip(), rs.FixIP()),
            lambda: (fix_ip(network=False), rs.FixIP(network=False)),
            lambda: (fix([r"^\d{2}:\d{2}:\d{2}(\.\d+)?$", r"^\d+\.\d+$"]),
                     rs.Fix([r"^\d{2}:\d{2}:\d{2}(\.\d+)?$", r"^\d+\.\d+$"])),
            lambda: (remove(r"^[^a-zA-Z0-9]+$"),
                     rs.Remove([r"^[^a-zA-Z0-9]+$"])),
            lambda: (fix_partial(ip_pat, fix_groups=["ip", "port"]),
                     rs.FixPartial([ip_pat], fix_groups=["ip", "port"])),
            lambda: (fix_parenthesis(['"', '"']),
                     rs.FixParenthesis(['"', '"'])),
            lambda: (fix_parenthesis(['(', ')'], recursive=True),
                     rs.FixParenthesis(['(', ')'], recursive=True)),
            lambda: (remove_partial(colon_pat, remove_groups=["colon"]),
                     rs.RemovePartial([colon_pat], remove_groups=["colon"])),
            lambda: (conditional_split(r'^%[A-Z]+-\d+$', r'%-'),
                     rs.ConditionalSplit([r'^%[A-Z]+-\d+$'], r'%-')),
        ]

    def test_random_pipelines_agree_with_reference(self):
        import random
        sys.path.insert(0, "/root/reference")
        from log2seq.statement import StatementParser

        rng = random.Random(404)
        pairs = self._action_pairs()
        n_nonempty = 0
        for _ in range(self.N_PIPELINES):
            chosen = [rng.choice(pairs)() for _ in
                      range(rng.randrange(1, 6))]
            ours = [c[0] for c in chosen]
            ref = StatementParser([c[1] for c in chosen])
            compiled = compile_actions(ours)
            vt = VectorTokenizer(ours)
            lines = ["".join(rng.choice(_ALPHABET)
                             for _ in range(rng.randrange(0, 60)))
                     for _ in range(4)]
            lines += ["10.0.0.1.8080 ok: (a(b)c) \"q w\" %ERR-5 1.5",
                      "x  y:z..  127.0.0.1"]
            vw, vs = vt.run(pd.Series(lines, dtype=object))
            for i, line in enumerate(lines):
                ew, es = ref.process_line(line)
                ow, os_ = tokenize_statement(compiled, line)
                assert ow == ew, (line, [type(c[1]).__name__ for c in chosen])
                assert os_ == es, (line,)
                assert vw[i] == ew and vs[i] == es, (line,)
                if ew:
                    n_nonempty += 1
        assert n_nonempty > 400, n_nonempty
