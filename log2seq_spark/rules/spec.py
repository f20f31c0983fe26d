"""Declarative rule specifications for the log2seq-spark engine.

A *rule program* describes how a raw log/transcript line is parsed:

* an ordered list of :class:`HeaderRule` (first match wins) extracts the
  header fields (timestamp parts, host, severity, ...) and the free-text
  ``message`` remainder, and
* an ordered list of statement :class:`Action` segments the message into
  ``words`` and ``symbols`` (separators), with ``len(symbols) ==
  len(words) + 1`` and byte-exact reconstruction
  ``symbols[0] + words[0] + ... + words[-1] + symbols[-1] == message``.

The specs are plain frozen dataclasses: they are built once on the driver,
validated and compiled (see :mod:`log2seq_spark.rules.synthesis`), and then
closure-captured by the vectorized executors.  Semantics mirror the
reference implementation (amulog/log2seq): header items
``/root/reference/log2seq/header.py:335-888``, statement actions
``/root/reference/log2seq/statement.py:115-659``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

# token-stream flags (reference: statement.py:18-20)
UNKNOWN = 0  # still active: later actions may split / fix / remove it
FIXED = 1    # protected word: untouchable by later actions
SEP = 2      # separator text: excluded from words

MONTH_ABBREVIATIONS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
                       "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


class RuleDefinitionError(Exception):
    """Raised at compile time for an invalid rule program
    (reference: ParserDefinitionError, _common.py:14-18)."""


class ParseFailure(Exception):
    """Raised (pure-python path only) when no header rule matches a line
    (reference: LogParseFailure, _common.py:21-28)."""


# ---------------------------------------------------------------------------
# header items
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HeaderField:
    """One component of a header rule's synthesized regex.

    ``kind`` selects the regex fragment + typed conversion; see the factory
    functions below for the catalog (mirrors reference header.py items).
    """
    kind: str
    name: Optional[str] = None        # user-facing name for named kinds
    optional: bool = False
    dummy: bool = False               # matched but never extracted
    # kind-specific parameters
    symbols: Optional[str] = None     # kind='string': extra allowed chars
    user_pattern: Optional[str] = None  # kind='user'
    strip: Optional[str] = None       # kind='user'
    century: int = 20                 # kind='year2' / 'date_concat'
    no_century: bool = False          # kind='date_concat'
    tz_offset_sec: int = 0            # kind='unixtime': tz the epoch resolves to
    members: Tuple["HeaderField", ...] = ()   # kind='group'
    separator: Optional[str] = None   # kind='group'

    # -- naming ----------------------------------------------------------
    @property
    def match_name(self) -> str:
        """Regex group name; mirrors the reference's per-class match names
        (header.py) including the DemicalSecond/Time shared-name quirk."""
        fixed = {
            "statement": "message",
            "date": "date",
            "time": "iso_time",
            "iso_datetime": "iso_datetime",
            "dsecond": "iso_time",       # quirk kept from header.py:652
            "tzone": "timezone",
            "unixtime": "unixtime",
            "date_concat": "date_concat",
            "time_concat": "time_concat",
            "year2": "year_nocentury",
            "month_abbr": "month_abb",
        }
        if self.kind in fixed:
            return fixed[self.kind]
        if self.name is None:
            raise RuleDefinitionError(f"field kind {self.kind!r} needs a name")
        return self.name

    @property
    def value_name(self) -> str:
        """Key under which the extracted value is reported."""
        fixed = {
            "statement": "message",
            "date": "date",
            "time": "time",
            "iso_datetime": "timestamp",
            "dsecond": "microsecond",
            "tzone": "tzinfo",
            "unixtime": "timestamp",
            "date_concat": "date",
            "time_concat": "time",
            "year2": "year",
            "month_abbr": "month",
        }
        if self.kind in fixed:
            return fixed[self.kind]
        return self.name  # named kinds

    def test(self, string: str):
        """Debug helper mirroring the reference ``Item.test``
        (reference header.py:390-402): anchored match of this single
        field's synthesized pattern against ``string``. Compiles the
        pattern per call — for debugging rule specs only.

        Returns the ``re.Match`` or ``None``.
        """
        import re as _re
        from .synthesis import field_regex
        return _re.compile(r"^" + field_regex(self) + r"$").match(string)


# factory helpers (the public spec-building API) ----------------------------

def statement(**kw) -> HeaderField:
    return HeaderField("statement", **kw)


def digit(name: str, **kw) -> HeaderField:
    return HeaderField("digit", name=name, **kw)


def string(name: str, symbols: Optional[str] = None, **kw) -> HeaderField:
    return HeaderField("string", name=name, symbols=symbols, **kw)


def hostname(name: str, **kw) -> HeaderField:
    return HeaderField("hostname", name=name, **kw)


def user_field(name: str, pattern: str, strip: Optional[str] = None, **kw) -> HeaderField:
    return HeaderField("user", name=name, user_pattern=pattern, strip=strip, **kw)


def date(**kw) -> HeaderField:
    return HeaderField("date", **kw)


def time_of_day(**kw) -> HeaderField:
    return HeaderField("time", **kw)


def iso_datetime(**kw) -> HeaderField:
    return HeaderField("iso_datetime", **kw)


def date_concat(no_century: bool = False, century: int = 20, **kw) -> HeaderField:
    return HeaderField("date_concat", no_century=no_century, century=century, **kw)


def time_concat(**kw) -> HeaderField:
    return HeaderField("time_concat", **kw)


def year2(century: int = 20, **kw) -> HeaderField:
    return HeaderField("year2", century=century, **kw)


def month_abbr(**kw) -> HeaderField:
    return HeaderField("month_abbr", **kw)


def dsecond(**kw) -> HeaderField:
    return HeaderField("dsecond", **kw)


def tzone(**kw) -> HeaderField:
    return HeaderField("tzone", **kw)


def unixtime(tz_offset_sec: int = 0, **kw) -> HeaderField:
    return HeaderField("unixtime", tz_offset_sec=tz_offset_sec, **kw)


def group(members, separator: Optional[str] = None, optional: bool = False) -> HeaderField:
    return HeaderField("group", members=tuple(members), separator=separator,
                       optional=optional, dummy=True)


# ---------------------------------------------------------------------------
# header rules
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HeaderRule:
    """One ordered header rule: fields + placement + timestamp policy.

    Placement is either ``separator`` style (fields joined by runs of the
    separator character class; reference header.py:250-290) or a
    ``full_format`` template with ``<i>`` placeholders
    (reference header.py:292-304).
    """
    fields: Tuple[HeaderField, ...]
    separator: Optional[str] = None
    full_format: Optional[str] = None
    defaults: Tuple[Tuple[str, object], ...] = ()   # e.g. (("year", 2024),)
    reformat_timestamp: bool = True
    # "year_from_ts": fill a missing year from the row's own ts column
    # (replaces the reference preset's datetime.now().year default,
    # preset.py:51 — pinned divergence for determinism).
    year_from_ts: bool = False
    # convert the assembled timestamp to this fixed offset (seconds), like
    # the reference's astimezone option (header.py:109-111). Divergence:
    # a NAIVE timestamp is treated as UTC here (the reference would use
    # the machine's local timezone — nondeterministic).
    astimezone_sec: Optional[int] = None

    def defaults_dict(self) -> dict:
        return dict(self.defaults)


# ---------------------------------------------------------------------------
# statement actions
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Action:
    """One statement-segmentation pass over the flagged token stream."""
    kind: str                      # see factories below
    patterns: Tuple[str, ...] = ()
    separators: str = ""
    fix_groups: Tuple[str, ...] = ()
    remove_groups: Tuple[str, ...] = ()
    rest_remove: bool = False
    recursive: bool = False
    match_address: bool = True     # kind='fix_ip'
    match_network: bool = True     # kind='fix_ip'


def _tup(patterns) -> Tuple[str, ...]:
    if isinstance(patterns, str):
        return (patterns,)
    return tuple(patterns)


def split(separators) -> Action:
    """Split active parts on runs of the given separator characters
    (reference Split, statement.py:573-621)."""
    if not isinstance(separators, str):
        separators = "".join(separators)
    return Action("split", separators=separators)


def fix(patterns) -> Action:
    """Protect active parts matching any pattern (re.match semantics;
    reference Fix, statement.py:135-186)."""
    return Action("fix", patterns=_tup(patterns))


def fix_ip(address: bool = True, network: bool = True) -> Action:
    """Protect parts that are stdlib ip addresses / networks
    (reference FixIP, statement.py:433-485)."""
    return Action("fix_ip", match_address=address, match_network=network)


def remove(patterns) -> Action:
    """Turn active parts matching any pattern into separators
    (reference Remove, statement.py:488-534)."""
    return Action("remove", patterns=_tup(patterns))


def fix_partial(patterns, fix_groups, recursive: bool = False,
                remove_groups=None, rest_remove: bool = False) -> Action:
    """Split a matching part at named-group spans; fix_groups → FIXED,
    remove_groups → SEP, rest → UNKNOWN (or SEP when rest_remove)
    (reference FixPartial, statement.py:189-369)."""
    return Action("partial", patterns=_tup(patterns),
                  fix_groups=_tup(fix_groups),
                  remove_groups=_tup(remove_groups or ()),
                  rest_remove=rest_remove, recursive=recursive)


def fix_parenthesis(pairs, recursive: bool = False) -> Action:
    """Sugar for fix_partial with a generated quoted-span pattern
    (reference FixParenthesis, statement.py:372-430)."""
    import re as _re
    if isinstance(pairs, str):
        pairs = [pairs]
    elif len(pairs) == 2 and isinstance(pairs[0], str):
        pairs = [pairs]
    pats = []
    for pair in pairs:
        if len(pair) != 2:
            raise RuleDefinitionError("fix_parenthesis needs [left, right] pairs")
        pats.append(r"^.*?(?P<left>" + _re.escape(pair[0]) + r")(?P<fix>.+?)"
                    r"(?P<right>" + _re.escape(pair[1]) + r").*$")
    return Action("partial", patterns=tuple(pats), fix_groups=("fix",),
                  remove_groups=("left", "right"), recursive=recursive)


def remove_partial(patterns, remove_groups, recursive: bool = False) -> Action:
    """fix_partial variant that only strips separator spans
    (reference RemovePartial, statement.py:537-570)."""
    return Action("partial", patterns=_tup(patterns),
                  remove_groups=_tup(remove_groups), recursive=recursive)


def conditional_split(patterns, separators) -> Action:
    """Split a part by separators only when the whole part matches one of
    the patterns (reference ConditionalSplit, statement.py:624-659)."""
    if not isinstance(separators, str):
        separators = "".join(separators)
    return Action("cond_split", patterns=_tup(patterns), separators=separators)


# ---------------------------------------------------------------------------
# the full program
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RuleProgram:
    """A complete parse program: ordered header rules + statement actions.

    Mirrors the reference LogParser composition (_common.py:31-163).
    """
    header_rules: Tuple[HeaderRule, ...]
    actions: Tuple[Action, ...]
    ignore_failure: bool = False
