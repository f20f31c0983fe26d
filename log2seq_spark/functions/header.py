"""Arrow/pandas-vectorized header parsing: mask-cascade of synthesized
regexes + vectorized typed conversion + timestamp assembly.

One ``Series.str.extract`` per header rule per batch, evaluated only on
rows still unmatched (first-match-wins exactly as the reference cascade,
``/root/reference/log2seq/_common.py:85-116``, but batched). Timestamp
assembly mirrors ``header.py:73-114`` with static per-rule branching:
which date/time sources a rule has is known at compile time, so each
branch is a straight vectorized pandas expression.

Timestamps are produced as *wall-clock* ``datetime64`` plus a nullable
``tz_sec`` offset column — Spark timestamps are zone-less instants, so the
reference's aware datetimes round-trip as (wall time, offset) pairs
(SURVEY.md §1.2).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..rules.spec import HeaderField, HeaderRule, MONTH_ABBREVIATIONS
from ..rules.synthesis import CompiledHeaderRule, compile_header_rule


import re as _re


def _rule_re2_usable(cr: CompiledHeaderRule) -> bool:
    """RE2 extraction is safe for a rule iff (a) RE2 compiles the pattern
    and (b) '' group values are unambiguous. RE2 reports '' for a
    NON-participating optional group where Python re reports None; every
    builtin fragment except the statement's ``.*`` cannot match empty, so
    '' → null is exact for them — but a user pattern that can match empty
    would be ambiguous, so such rules take the pandas path."""
    for f in cr.picked:
        if f.kind == "user" and f.user_pattern is not None:
            if _re.compile("^(?:" + f.user_pattern + ")$").match(""):
                return False
    try:
        pc.extract_regex(pa.array([], type=pa.string()), cr.pattern.pattern)
        return True
    except (pa.lib.ArrowInvalid, pa.lib.ArrowNotImplementedError):
        return False


def _extract_groups(cr: CompiledHeaderRule, re2_ok: bool,
                    sub: pd.Series) -> pd.DataFrame:
    """Named-group extraction for one rule over still-unmatched lines.

    RE2 (pyarrow.compute.extract_regex) when the rule is RE2-usable and
    the batch is pure ASCII (RE2 char classes are ASCII-only); pandas
    ``str.extract`` (Python re) otherwise. Measured ~6× faster on the
    preset rules. RE2 rows that did not match have a null struct; ''
    values in non-message groups are absent optionals → null (see
    _rule_re2_usable)."""
    if re2_ok:
        arr = pa.array(sub.to_numpy(dtype=object), type=pa.string())
        if pc.all(pc.string_is_ascii(arr)).as_py():
            st = pc.extract_regex(arr, cr.pattern.pattern)
            valid = st.is_valid().to_numpy(zero_copy_only=False)
            cols = {}
            for i, field in enumerate(st.type):
                arr = st.field(i).to_pandas().to_numpy(dtype=object)
                arr[~valid] = None
                if field.name != "message":
                    arr[arr == ""] = None
                cols[field.name] = arr
            out = pd.DataFrame(cols)
            out.index = sub.index
            return out
    ext = sub.str.extract(cr.pattern)
    return ext[[g for g in cr.pattern.groupindex]]

# value names consumed by timestamp assembly — never emitted as attrs
TIME_VALUE_NAMES = frozenset(
    {"timestamp", "date", "time", "year", "month", "day", "hour", "minute",
     "second", "microsecond", "tzinfo"})

_MONTH_INDEX = {name: i + 1 for i, name in enumerate(MONTH_ABBREVIATIONS)}


def attr_fields_of(rules) -> List[Tuple[str, str]]:
    """Static output attr schema for a set of rules: ordered unique
    (name, dtype) pairs where dtype is 'str' or 'int'. Dynamic dict keys
    of the reference become static struct fields here. Time-related names
    are consumed by timestamp assembly — except for reformat_timestamp=
    False rules, whose time fields surface as raw matched strings."""
    out: List[Tuple[str, str]] = []
    seen = set()
    for rule in rules:
        cr = compile_header_rule(rule)
        for f in cr.picked:
            vn = f.value_name
            if rule.reformat_timestamp and vn in TIME_VALUE_NAMES:
                continue
            if vn == "message" or vn in seen:
                continue
            seen.add(vn)
            out.append((vn, "int" if f.kind in ("digit", "year2") else "str"))
    return out


def _map_unique(col: pd.Series, fn) -> pd.Series:
    """Apply an exact scalar converter once per DISTINCT value (tz and
    fractional-second tokens have tiny cardinality), null-preserving."""
    mask = col.notna()
    if not mask.any():
        return pd.Series(np.nan, index=col.index)
    table = {u: fn(u) for u in pd.unique(col[mask])}
    return col.map(table)


def _usec_from_fraction(col: pd.Series) -> pd.Series:
    """Fraction→microseconds: pad/truncate to six digits, integer-only —
    the oracle's own converter, dictionary-applied."""
    from ..rules.engine import fraction_to_microseconds
    return _map_unique(col, fraction_to_microseconds)


def _tz_offset_seconds(col: pd.Series) -> pd.Series:
    """tz token → signed offset seconds ('Z' → 0) — the oracle's own
    converter, dictionary-applied."""
    from ..rules.engine import tz_to_offset_seconds
    return _map_unique(col, tz_to_offset_seconds)


def _num(ext: pd.DataFrame, name: str) -> pd.Series:
    if name in ext.columns:
        return pd.to_numeric(ext[name], errors="coerce")
    return pd.Series(np.nan, index=ext.index)


class _RulePlan:
    """Per-rule vectorized conversion plan, derived statically."""

    def __init__(self, cr: CompiledHeaderRule):
        self.cr = cr
        kinds = {f.kind for f in cr.picked}
        by_kind: Dict[str, HeaderField] = {f.kind: f for f in cr.picked}
        self.field_by_value: Dict[str, HeaderField] = {
            f.value_name: f for f in cr.picked}
        self.direct_kind = ("iso_datetime" if "iso_datetime" in kinds
                            else "unixtime" if "unixtime" in kinds else None)
        self.date_kind = ("date" if "date" in kinds
                          else "date_concat" if "date_concat" in kinds else None)
        self.time_kind = ("time" if "time" in kinds
                          else "time_concat" if "time_concat" in kinds else None)
        self.by_kind = by_kind
        self.defaults = cr.rule.defaults_dict()

    # ------------------------------------------------------------------
    def timestamp_parts(self, ext: pd.DataFrame,
                        default_year: Optional[pd.Series]):
        """→ (wall datetime64[ns] Series, tz_sec Float series, ok mask)."""
        idx = ext.index
        n = len(ext)
        nan = pd.Series(np.nan, index=idx)
        tz_sec = nan.copy()

        if self.direct_kind == "unixtime":
            f = self.by_kind["unixtime"]
            epoch = _num(ext, "unixtime")
            wall = (pd.to_datetime(epoch, unit="s", errors="coerce")
                    + pd.to_timedelta(f.tz_offset_sec, unit="s"))
            tz_sec[:] = float(f.tz_offset_sec)
            return wall, tz_sec, wall.notna()

        if self.direct_kind == "iso_datetime":
            year = _num(ext, "year")
            month = _num(ext, "month")
            day = _num(ext, "day")
            hour, minute, second = (_num(ext, k) for k in
                                    ("hour", "minute", "second"))
            usec = _usec_from_fraction(ext["dsecond"]) if "dsecond" in ext else nan
            if "tz" in ext:
                tz_sec = _tz_offset_seconds(ext["tz"]).astype("float")
        else:
            # date side
            if self.date_kind == "date":
                year, month, day = (_num(ext, k) for k in ("year", "month", "day"))
            elif self.date_kind == "date_concat":
                f = self.by_kind["date_concat"]
                s = ext["date_concat"].astype("string")
                if f.no_century:
                    year = f.century * 100 + pd.to_numeric(s.str.slice(0, 2),
                                                           errors="coerce")
                    month = pd.to_numeric(s.str.slice(2, 4), errors="coerce")
                    day = pd.to_numeric(s.str.slice(4, 6), errors="coerce")
                else:
                    year = pd.to_numeric(s.str.slice(0, 4), errors="coerce")
                    month = pd.to_numeric(s.str.slice(4, 6), errors="coerce")
                    day = pd.to_numeric(s.str.slice(6, 8), errors="coerce")
            else:
                # loose year/month/day value fields (digit / year2 / month_abbr)
                yf = self.field_by_value.get("year")
                if yf is not None and yf.kind == "year2":
                    year = yf.century * 100 + _num(ext, yf.match_name)
                elif yf is not None:
                    year = _num(ext, yf.match_name)
                else:
                    year = nan.copy()
                mf = self.field_by_value.get("month")
                if mf is not None and mf.kind == "month_abbr":
                    month = ext[mf.match_name].map(_MONTH_INDEX)
                elif mf is not None:
                    month = _num(ext, mf.match_name)
                else:
                    month = nan.copy()
                df_ = self.field_by_value.get("day")
                day = _num(ext, df_.match_name) if df_ is not None else nan.copy()

            # defaults (incl. the year-from-row-ts policy)
            if "year" in self.defaults:
                year = year.fillna(self.defaults["year"])
            if self.cr.rule.year_from_ts and default_year is not None:
                year = year.fillna(default_year)
            for key, series in (("month", month), ("day", day)):
                if key in self.defaults:
                    series.fillna(self.defaults[key], inplace=True)

            # time side
            if self.time_kind == "time":
                hour, minute, second = (_num(ext, k) for k in
                                        ("hour", "minute", "second"))
                usec = (_usec_from_fraction(ext["dsecond"])
                        if "dsecond" in ext else nan)
                if "tz" in ext:
                    tz_sec = _tz_offset_seconds(ext["tz"]).astype("float")
            elif self.time_kind == "time_concat":
                s = ext["time_concat"].astype("string")
                hour = pd.to_numeric(s.str.slice(0, 2), errors="coerce")
                minute = pd.to_numeric(s.str.slice(2, 4), errors="coerce")
                second = pd.to_numeric(s.str.slice(4, 6), errors="coerce")
                usec = nan
            else:
                hour = _num(ext, "hour") if "hour" in ext else nan
                minute = _num(ext, "minute") if "minute" in ext else nan
                second = _num(ext, "second") if "second" in ext else nan
                usec = nan
                dsf = self.field_by_value.get("microsecond")
                if dsf is not None:
                    usec = _usec_from_fraction(ext[dsf.match_name])
                # missing time-of-day parts default to 0 (datetime.time(**kw))
                hour = hour.fillna(0)
                minute = minute.fillna(0)
                second = second.fillna(0)

            # standalone tzone item applies only where the time itself
            # carried no tz (reference header.py:96-99)
            tzf = self.field_by_value.get("tzinfo")
            if tzf is not None:
                standalone = _tz_offset_seconds(ext[tzf.match_name]).astype("float")
                tz_sec = tz_sec.where(tz_sec.notna(), standalone)

        frame = pd.DataFrame({"year": year, "month": month, "day": day,
                              "hour": hour.fillna(0), "minute": minute.fillna(0),
                              "second": second.fillna(0)}, index=idx)
        ok = frame[["year", "month", "day"]].notna().all(axis=1)
        wall = pd.to_datetime(frame.where(ok), errors="coerce")
        usec = usec.fillna(0)
        wall = wall + pd.to_timedelta(usec, unit="us")
        return wall, tz_sec, wall.notna()

    # ------------------------------------------------------------------
    def attr_columns(self, ext: pd.DataFrame) -> Dict[str, pd.Series]:
        """Typed non-time attr columns for this rule's matched rows."""
        out: Dict[str, pd.Series] = {}
        for f in self.cr.picked:
            vn = f.value_name
            if self.cr.rule.reformat_timestamp and vn in TIME_VALUE_NAMES:
                continue
            if vn == "message":
                continue
            col = ext[f.match_name]
            if f.kind in ("digit", "year2"):
                val = pd.to_numeric(col, errors="coerce")
                if f.kind == "year2":
                    val = val + f.century * 100
            elif f.kind == "user" and f.strip is not None:
                val = col.str.strip(f.strip)
            else:
                val = col
            out[vn] = val
        return out


class VectorHeaderParser:
    """Batch header parser: ordered rules, first-match-wins mask cascade."""

    def __init__(self, rules):
        self.compiled = [compile_header_rule(r) for r in rules]
        self.plans = [_RulePlan(cr) for cr in self.compiled]
        self.attr_schema = attr_fields_of(rules)
        self._re2_ok = [_rule_re2_usable(cr) for cr in self.compiled]

    def run(self, lines: pd.Series,
            default_year: Optional[pd.Series] = None) -> pd.DataFrame:
        """→ DataFrame indexed like ``lines`` with columns: rule_id (int16,
        -1 = no match, -2 = empty), message (object), ts (datetime64),
        tz_sec (float, NaN = naive), error (object), plus one typed column
        per attr in ``attr_schema``."""
        n = len(lines)
        lines = lines.reset_index(drop=True)
        stripped = lines.fillna("").str.rstrip("\r\n")
        if default_year is not None:
            default_year = pd.Series(
                np.asarray(default_year, dtype="float64"))

        rule_id = np.full(n, -1, dtype=np.int16)
        message = pd.Series([None] * n, dtype=object)
        ts = pd.Series(pd.NaT, index=range(n))
        tz_sec = pd.Series(np.nan, index=range(n))
        error = pd.Series([None] * n, dtype=object)
        attrs: Dict[str, pd.Series] = {
            name: pd.Series([None] * n,
                            dtype="object" if dt == "str" else "float64")
            for name, dt in self.attr_schema}

        empty = stripped == ""
        rule_id[np.flatnonzero(empty)] = -2
        pending = ~empty

        for rid, (cr, plan) in enumerate(zip(self.compiled, self.plans)):
            if not pending.any():
                break
            sub = stripped[pending]
            ext = _extract_groups(cr, self._re2_ok[rid], sub)
            matched = ext["message"].notna()
            if not matched.any():
                continue
            mext = ext[matched]
            midx = mext.index  # positions in the batch
            claimed = midx     # every matched row leaves the cascade

            if cr.rule.reformat_timestamp:
                dy = default_year[midx] if default_year is not None else None
                wall, off, ok = plan.timestamp_parts(mext, dy)
                if cr.rule.astimezone_sec is not None:
                    astz = float(cr.rule.astimezone_sec)
                    # naive → UTC (documented divergence); aware → shift
                    utc = wall - pd.to_timedelta(off.fillna(0), unit="s")
                    wall = utc + pd.to_timedelta(astz, unit="s")
                    off = pd.Series(astz, index=off.index)
                # a matched rule whose timestamp cannot assemble FAILS
                # the whole line, exactly like the reference / oracle
                # engine (the LogParseFailure from header.py:73-114
                # propagates out of the cascade — no record, no retry of
                # later rules): demote those rows to failures instead of
                # emitting a half-parsed record the reference never would
                okmask = ok.to_numpy(dtype=bool)
                bad = midx[~okmask]
                if len(bad):
                    error[bad] = ("timestamp part missing; "
                                  "use rule defaults to add it")
                    midx = midx[okmask]
                    mext = mext.loc[midx]
                    wall, off = wall.loc[midx], off.loc[midx]
                ts[midx] = wall
                tz_sec[midx] = off
            message[midx] = mext["message"]
            for name, col in plan.attr_columns(mext).items():
                attrs[name][midx] = col
            rule_id[midx] = rid
            pending = pending.copy()
            # even assembly-failed rows leave the cascade (the
            # reference's raise propagates; later rules never run)
            pending[claimed] = False

        fail_idx = np.flatnonzero(pending.to_numpy() if hasattr(pending, "to_numpy")
                                  else pending)
        if len(fail_idx):
            error[fail_idx] = ("header format mismatch: "
                               + stripped[fail_idx].str.slice(0, 50))

        out = pd.DataFrame({"rule_id": rule_id, "message": message,
                            "ts": pd.to_datetime(ts), "tz_sec": tz_sec,
                            "error": error})
        for name, _ in self.attr_schema:
            out[name] = attrs[name]
        return out
