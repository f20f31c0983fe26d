"""Pure-Python single-line evaluator — the semantics oracle.

This is the executable spec for the vectorized engine: it parses one line
exactly like the reference (amulog/log2seq) and is used (a) by the ported
golden tests, (b) as the per-line equality oracle for the pandas/Arrow
path, and (c) as the per-distinct-token evaluator for span-dependent
partial actions inside the vectorized tokenizer.

Semantics mirrored from ``/root/reference/log2seq``:
header pick/convert header.py:412-888, timestamp assembly header.py:73-114,
first-match-wins cascade _common.py:85-116, statement fold + separate
statement.py:57-112.
"""

from __future__ import annotations

import datetime
import ipaddress
import re
from typing import Dict, List, Optional, Tuple

from .spec import (UNKNOWN, FIXED, SEP, Action, HeaderRule, RuleProgram,
                   ParseFailure, MONTH_ABBREVIATIONS)
from .synthesis import CompiledHeaderRule, compile_header_rule

# ---------------------------------------------------------------------------
# scalar converters
# ---------------------------------------------------------------------------

def tz_to_offset_seconds(token: str) -> int:
    """``Z`` / ``+0900`` / ``+09:00`` / ``-06:00`` → signed offset seconds
    (reference header.py:35-48)."""
    if token == "Z":
        return 0
    sign = -1 if token[0] == "-" else 1
    digits = token[1:].replace(":", "")
    return sign * (int(digits[0:2]) * 3600 + int(digits[2:4]) * 60)


def fraction_to_microseconds(token: str) -> int:
    """Fractional-second digits → microseconds, pad/truncate to 6 digits,
    integer arithmetic only (reference header.py:51-58)."""
    return int((token + "000000")[:6])


def _tzinfo(offset_sec: int) -> datetime.tzinfo:
    if offset_sec == 0:
        return datetime.timezone.utc
    return datetime.timezone(datetime.timedelta(seconds=offset_sec))


def pick_field_value(field, mo):
    """Typed value for one matched header field, or None when the (optional)
    group did not participate. Mirrors each Item.pick_value."""
    raw = mo.group(field.match_name)
    if raw is None:
        return None
    k = field.kind
    if k in ("statement", "string", "hostname"):
        return raw
    if k == "user":
        return raw.strip(field.strip) if field.strip is not None else raw
    if k == "digit":
        return int(raw)
    if k == "year2":
        return field.century * 100 + int(raw)
    if k == "month_abbr":
        return MONTH_ABBREVIATIONS.index(raw) + 1
    if k == "dsecond":
        return fraction_to_microseconds(raw)
    if k == "tzone":
        return _tzinfo(tz_to_offset_seconds(raw))
    if k == "unixtime":
        return datetime.datetime.fromtimestamp(int(raw), tz=_tzinfo(field.tz_offset_sec))
    if k == "date":
        return datetime.date(int(mo.group("year")), int(mo.group("month")),
                             int(mo.group("day")))
    if k == "time":
        kw = dict(hour=int(mo.group("hour")), minute=int(mo.group("minute")),
                  second=int(mo.group("second")))
        ds = mo.group("dsecond")
        if ds is not None:
            kw["microsecond"] = fraction_to_microseconds(ds)
        tz = mo.group("tz")
        if tz is not None:
            kw["tzinfo"] = _tzinfo(tz_to_offset_seconds(tz))
        return datetime.time(**kw)
    if k == "iso_datetime":
        d = datetime.date(int(mo.group("year")), int(mo.group("month")),
                          int(mo.group("day")))
        t = pick_field_value_time_like(mo)
        return datetime.datetime.combine(d, t)
    if k == "date_concat":
        if field.no_century:
            return datetime.date(field.century * 100 + int(raw[0:2]),
                                 int(raw[2:4]), int(raw[4:6]))
        return datetime.date(int(raw[0:4]), int(raw[4:6]), int(raw[6:8]))
    if k == "time_concat":
        return datetime.time(int(raw[0:2]), int(raw[2:4]), int(raw[4:6]))
    raise AssertionError(f"unhandled kind {k}")


def pick_field_value_time_like(mo) -> datetime.time:
    kw = dict(hour=int(mo.group("hour")), minute=int(mo.group("minute")),
              second=int(mo.group("second")))
    ds = mo.group("dsecond")
    if ds is not None:
        kw["microsecond"] = fraction_to_microseconds(ds)
    tz = mo.group("tz")
    if tz is not None:
        kw["tzinfo"] = _tzinfo(tz_to_offset_seconds(tz))
    return datetime.time(**kw)


# ---------------------------------------------------------------------------
# timestamp assembly (reference header.py:73-114)
# ---------------------------------------------------------------------------

_DATE_KEYS = ("year", "month", "day")
_TIME_KEYS = ("hour", "minute", "second", "microsecond", "tzinfo")


def assemble_timestamp(record: dict) -> dict:
    """Combine extracted date/time parts into record['timestamp'],
    consuming the intermediate keys. Raises ParseFailure on missing parts."""
    if "timestamp" in record:
        return record
    if "date" in record:
        dateobj = record.pop("date")
    else:
        for key in _DATE_KEYS:
            if key not in record or record[key] is None:
                raise ParseFailure(f"timestamp part {key!r} is missing")
        dateobj = datetime.date(*[record.pop(k) for k in _DATE_KEYS])
    if "time" in record:
        timeobj = record.pop("time")
        if "tzinfo" in record and timeobj.tzinfo is None:
            timeobj = timeobj.replace(tzinfo=record.pop("tzinfo"))
    else:
        kw = {k: record.pop(k) for k in _TIME_KEYS if k in record}
        timeobj = datetime.time(**kw)
    record["timestamp"] = datetime.datetime.combine(dateobj, timeobj)
    return record


# ---------------------------------------------------------------------------
# statement tokenization (the flagged token stream)
# ---------------------------------------------------------------------------

Part = Tuple[str, int]


def _active(part: Part) -> bool:
    return len(part[0]) > 0 and part[1] == UNKNOWN


def _split_pieces(rx: re.Pattern, text: str):
    """Alternating (piece, flag) spans of one token under a separator-run
    regex; empty non-separator spans are elided."""
    pieces = rx.split(text)
    for i, piece in enumerate(pieces):
        if i % 2 == 1:
            yield piece, SEP
        elif piece != "":
            yield piece, UNKNOWN


def is_ip_token(token: str, address: bool = True, network: bool = True) -> bool:
    """stdlib ip_address / ip_network membership with the reference's
    cheap prefilter (statement.py:448-469)."""
    if "." not in token and ":" not in token:
        return False
    if address:
        try:
            ipaddress.ip_address(token)
            return True
        except ValueError:
            pass
    if network and "/" in token:
        try:
            ipaddress.ip_network(token, strict=False)
            return True
        except ValueError:
            pass
    return False


def _span_pieces(part: str, mo: re.Match, group_flags: Dict[str, int],
                 other_flag: int):
    """Cut one part at the named-group spans of a match
    (reference statement.py:243-264)."""
    cursor = 0
    order = sorted(group_flags, key=lambda g: mo.start(g))
    for g in order:
        if mo.start(g) == -1:
            continue
        if mo.start(g) < cursor:
            raise ValueError("overlapping named groups in partial action")
        if mo.start(g) > cursor:
            yield part[cursor:mo.start(g)], other_flag
        yield part[mo.start(g):mo.end(g)], group_flags[g]
        cursor = mo.end(g)
    if cursor < len(part):
        yield part[cursor:], other_flag


def _apply_partial_one(part: str, flag: int, rx: re.Pattern,
                       group_flags: Dict[str, int], other_flag: int,
                       recursive: bool):
    mo = rx.match(part)
    if mo is None:
        yield part, flag
        return
    for piece, pflag in _span_pieces(part, mo, group_flags, other_flag):
        if recursive and pflag == other_flag:
            yield from _apply_partial_one(piece, pflag, rx, group_flags,
                                          other_flag, recursive)
        else:
            yield piece, pflag


class _CompiledAction:
    """One action with its regexes precompiled."""

    __slots__ = ("spec", "split_rx", "split_contains_rx", "match_rxs",
                 "group_flags", "other_flag")

    def __init__(self, spec: Action):
        self.spec = spec
        self.split_rx = None
        self.split_contains_rx = None
        self.match_rxs = []
        self.group_flags = {}
        self.other_flag = UNKNOWN
        if spec.kind in ("split", "cond_split"):
            # one group around the whole run so re.split alternates
            # part / full-separator-run / part ...
            self.split_rx = re.compile(
                r"([" + re.escape(spec.separators) + r"]+)")
            # prefilter used by the vectorized path
            self.split_contains_rx = re.compile(
                r"[" + re.escape(spec.separators) + r"]")
        if spec.kind in ("fix", "remove", "cond_split", "partial"):
            self.match_rxs = [re.compile(p) for p in spec.patterns]
        if spec.kind == "partial":
            self.group_flags = {g: FIXED for g in spec.fix_groups}
            self.group_flags.update({g: SEP for g in spec.remove_groups})
            self.other_flag = SEP if spec.rest_remove else UNKNOWN

    def matches(self, token: str) -> bool:
        return any(rx.match(token) for rx in self.match_rxs)

    # -- per-part-list application (pure path) ---------------------------
    def run(self, parts: List[Part]) -> List[Part]:
        k = self.spec.kind
        if k == "split":
            out: List[Part] = []
            for p in parts:
                if _active(p):
                    out.extend(_split_pieces(self.split_rx, p[0]))
                else:
                    out.append(p)
            return out
        if k == "fix":
            return [(s, FIXED) if _active((s, f)) and self.matches(s) else (s, f)
                    for s, f in parts]
        if k == "remove":
            return [(s, SEP) if _active((s, f)) and self.matches(s) else (s, f)
                    for s, f in parts]
        if k == "fix_ip":
            sp = self.spec
            return [(s, FIXED) if _active((s, f)) and
                    is_ip_token(s, sp.match_address, sp.match_network) else (s, f)
                    for s, f in parts]
        if k == "cond_split":
            out = []
            for s, f in parts:
                if _active((s, f)) and self.matches(s):
                    out.extend(_split_pieces(self.split_rx, s))
                else:
                    out.append((s, f))
            return out
        if k == "partial":
            # each pattern sweeps the whole (evolving) part list in turn
            # (reference statement.py:266-279)
            for rx in self.match_rxs:
                nxt: List[Part] = []
                for s, f in parts:
                    if _active((s, f)):
                        nxt.extend(_apply_partial_one(
                            s, f, rx, self.group_flags, self.other_flag,
                            self.spec.recursive))
                    else:
                        nxt.append((s, f))
                parts = nxt
            return parts
        raise AssertionError(f"unhandled action kind {k}")


def compile_actions(actions) -> List[_CompiledAction]:
    return [_CompiledAction(a) for a in actions]


def separate(parts: List[Part]) -> Tuple[List[str], List[str]]:
    """Terminal pass: drop empty words, merge adjacent separators, insert
    empty separators between adjacent words and at both ends
    (reference statement.py:57-85). Note: unlike the reference (which
    asserts out), an empty word between two separators merges them here.
    """
    words: List[str] = []
    symbols: List[str] = []
    after_word = True  # line start behaves like "just after a word"
    for text, flag in parts:
        if flag == SEP:
            if after_word:
                symbols.append(text)
            else:
                symbols[-1] += text
            after_word = False
        elif text != "":
            if after_word:
                symbols.append("")
            words.append(text)
            after_word = True
    if after_word:
        symbols.append("")
    assert len(symbols) == len(words) + 1
    return words, symbols


# reference statement.py action class names for verbose progress output
# (our Action.kind is a structural tag: the three FixPartial-shaped sugars
# — fix_partial / fix_parenthesis / remove_partial — all compile to kind
# 'partial' and print as FixPartial)
_VERBOSE_ACT_NAMES = {
    "split": "Split", "fix": "Fix", "fix_ip": "FixIP", "remove": "Remove",
    "partial": "FixPartial", "cond_split": "ConditionalSplit",
}


def _verbose_parts(act: "_CompiledAction", parts: List[Part]) -> None:
    """Reference-format progress line (statement.py:44-54): fixed parts
    as ``#part#``, unknown parts as ``'part'``, separators omitted."""
    name = _VERBOSE_ACT_NAMES.get(act.spec.kind, act.spec.kind)
    words = []
    for text, flag in parts:
        if flag == FIXED:
            words.append("#" + text + "#")
        elif flag == UNKNOWN:
            words.append("'" + text + "'")
    print("{0}: {1}".format(name, ", ".join(words)))


def tokenize_statement(compiled_actions, statement: str,
                       verbose: bool = False) -> Tuple[List[str], List[str]]:
    if verbose:
        print("Statement: {0}".format(statement))
    parts: List[Part] = [(statement, UNKNOWN)]
    for act in compiled_actions:
        parts = act.run(parts)
        if verbose:
            _verbose_parts(act, parts)
    return separate(parts)


def apply_partial_to_token(act: _CompiledAction, token: str) -> Optional[List[Part]]:
    """Run one 'partial' action on a single token. Returns the resulting
    part list, or None if the token is unchanged. Used by the vectorized
    tokenizer's distinct-token dictionary path."""
    parts: List[Part] = [(token, UNKNOWN)]
    changed = False
    for rx in act.match_rxs:
        nxt: List[Part] = []
        for s, f in parts:
            if _active((s, f)):
                pieces = list(_apply_partial_one(
                    s, f, rx, act.group_flags, act.other_flag,
                    act.spec.recursive))
                if pieces != [(s, f)]:
                    changed = True
                nxt.extend(pieces)
            else:
                nxt.append((s, f))
        parts = nxt
    return parts if changed else None


# ---------------------------------------------------------------------------
# the line engine
# ---------------------------------------------------------------------------

class LineEngine:
    """Compiled pure-Python evaluator for a RuleProgram."""

    def __init__(self, program: RuleProgram, default_year: Optional[int] = None):
        self.program = program
        self.rules: List[CompiledHeaderRule] = [
            compile_header_rule(r) for r in program.header_rules]
        self.actions = compile_actions(program.actions)
        self.default_year = default_year

    def parse_header(self, line: str, verbose: bool = False):
        """First-match-wins cascade → (rule_id, record dict); raises
        ParseFailure when nothing matches. ``verbose`` prints per-rule
        match progress in the reference's format (_common.py:85-116)."""
        for rule_id, cr in enumerate(self.rules):
            mo = cr.pattern.match(line)
            if mo is None:
                if verbose:
                    print("header rule {0}: mismatch".format(rule_id))
                continue
            if verbose:
                print("header rule {0}: match".format(rule_id))
            record = cr.rule.defaults_dict()
            if cr.rule.year_from_ts and self.default_year is not None:
                record.setdefault("year", self.default_year)
            for f in cr.picked:
                val = pick_field_value(f, mo)
                if val is not None:
                    record[f.value_name] = val
            if cr.rule.reformat_timestamp:
                record = assemble_timestamp(record)
                if cr.rule.astimezone_sec is not None:
                    dt = record["timestamp"]
                    if dt.tzinfo is None:
                        # divergence: naive treated as UTC (the reference
                        # would use the machine-local zone)
                        dt = dt.replace(tzinfo=datetime.timezone.utc)
                    record["timestamp"] = dt.astimezone(
                        _tzinfo(cr.rule.astimezone_sec))
            return rule_id, record
        raise ParseFailure(f"header format mismatch: {line[:50]}")

    def parse_line(self, line: str, verbose: bool = False) -> Optional[dict]:
        """Full parse of one line → dict with header fields + words/symbols;
        None for empty lines (and failures when ignore_failure)."""
        line = line.rstrip("\r\n")
        if line == "":
            return None
        try:
            rule_id, record = self.parse_header(line, verbose)
        except ParseFailure:
            if self.program.ignore_failure:
                return None
            raise
        record["rule_id"] = rule_id
        message = record.get("message")
        if message is not None:
            words, symbols = tokenize_statement(self.actions, message, verbose)
            record["words"] = words
            record["symbols"] = symbols
        return record
