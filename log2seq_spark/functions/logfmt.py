"""logfmt parsing — the key=value telemetry line format (public
convention popularized by Heroku/Go ecosystems: space-separated
``key=value`` pairs, values optionally double-quoted with backslash
escapes when they contain spaces).

Pure built-in expressions end to end: one ``regexp_extract_all`` scan
tokenizes the pairs, higher-order functions split keys from values and
unquote, ``map_from_entries`` builds the map — no Python, no UDF, whole
plan stays inside codegen. The 100-TB shape is a map-only projection.

Duplicate keys keep the LAST occurrence (map_from_entries raises on
duplicates under ANSI, so the entry array is deduplicated keep-last
first — matching how most logfmt consumers overwrite repeated keys).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one logfmt pair: bare key, '=', then a quoted (escapes allowed) or
# bare value. RE2-safe (no backrefs/lookaround) like every pattern in
# the engine. A bare value may be empty (`key=`), and a bare key with
# no '=' is a flag token (ignored here; logfmt consumers disagree on
# flags, and silently minting key->"" entries would invent data).
# The (?:^|\s) boundary is CONSUMED (RE2 has no lookbehind); without
# it, "9bad=5" would mint a fabricated key "bad" from the middle of a
# non-key token. Key and value are CAPTURE groups: two codegen'd
# regexp_extract_all scans (group 1 = keys, group 2 = values) replace
# the old one-scan + per-token interpreted ltrim/instr/substring split
# — the higher-order lambda is the interpreted part of this plan, so
# shrinking it beat saving the second scan ~2x at bench scale. The
# grouping changes nothing about what matches (same pattern, groups
# added around what the split produced).
_PAIR = (r'(?:^|\s)([A-Za-z_][A-Za-z0-9_.\-/]*)='
         r'("(?:[^"\\]|\\.)*"|[^\s"]*)')


def logfmt_entries_expr(text_col):
    """``array<struct<key,value>>`` of the pairs in order of appearance
    (duplicates preserved — feed :func:`logfmt_map_expr` for keep-last
    map semantics). Quoted values are unquoted and unescaped."""
    keys = F.regexp_extract_all(text_col, F.lit(_PAIR), 1)
    vals = F.regexp_extract_all(text_col, F.lit(_PAIR), 2)

    def entry(k, v):
        quoted = v.startswith('"') & v.endswith('"') & (F.length(v) >= 2)
        inner = F.substring(v, F.lit(2), F.length(v) - 2)
        # the unescape regex is an identity when the value carries no
        # backslash — skip the (interpreted, per-element) regex eval on
        # the overwhelmingly common escape-free token
        unq = F.when(inner.contains("\\"),
                     F.regexp_replace(inner, r'\\(.)', r'$1')) \
               .otherwise(inner)
        return F.struct(k.alias("key"),
                        F.when(quoted, unq).otherwise(v).alias("value"))

    return F.zip_with(keys, vals, entry)


def _map_from_entries_keeplast(entries):
    """keep-LAST map over a BOUND ``array<struct<key,value>>`` column:
    an entry survives iff no later entry carries its key (positional
    compare — O(pairs²) per line, pairs is small). ``entries`` must be
    a bound column, NOT an expression tree: higher-order lambdas
    re-evaluate captured trees per element (the textstats
    ``repetition_stats`` lesson — measured O(n²) regex re-runs)."""
    n = F.size(entries)
    keep = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: ~F.exists(
            F.slice(entries, i + 1, n - i),
            lambda e: e["key"] == F.get(entries, i - 1)["key"]))
    survivors = F.transform(keep, lambda i: F.get(entries, i - 1))
    # null text -> null map (no branch matches); pair-less text -> empty
    return (F.when(n > 0, F.map_from_entries(survivors))
             .when(n == 0, F.create_map().cast("map<string,string>")))


def with_logfmt(df: DataFrame, text_col: str = "text",
                out_col: str = "logfmt",
                keys: Optional[Sequence[str]] = None,
                unique_keys: bool = False) -> DataFrame:
    """Adds ``out_col`` (``map<string,string>``, keep-last for repeated
    keys — ANSI ``map_from_entries`` refuses duplicates); with ``keys``
    given, also lifts each into its own string column (null when
    absent) — the projection shape downstream filters and aggregates
    prune to. The entry array is staged as a bound column so the
    tokenizing regex runs ONCE per row, not once per lambda capture.

    ``unique_keys=True`` skips the keep-last dedup pass (an interpreted
    O(pairs²) higher-order filter) for sources whose schema guarantees
    each key appears at most once per line — the right knob for
    fixed-schema telemetry at scale. It is an assertion, not a cast:
    ANSI ``map_from_entries`` raises DUPLICATED_MAP_KEY loudly if a
    line violates it (never a silent first/last pick)."""
    tmp = f"__{out_col}_entries"
    if tmp in df.columns:
        raise ValueError(f"input frame already has internal column "
                         f"{tmp!r}; rename it before with_logfmt")
    staged = df.select(
        "*", logfmt_entries_expr(F.col(text_col)).alias(tmp))
    if unique_keys:
        ent = F.col(tmp)
        mapped = (F.when(F.size(ent) > 0, F.map_from_entries(ent))
                   .when(F.size(ent) == 0,
                         F.create_map().cast("map<string,string>")))
    else:
        mapped = _map_from_entries_keeplast(F.col(tmp))
    out = staged.select("*", mapped.alias(out_col))
    for k in keys or ():
        out = out.withColumn(k, F.try_element_at(out_col, F.lit(k)))
    return out.drop(tmp)
