"""Spark bindings: one Arrow-vectorized pandas UDF per rule program.

The whole parse (header cascade + tokenize + separate) runs inside a
single scalar pandas UDF returning one struct column, so raw text crosses
the JVM↔Python boundary exactly once and downstream field accesses are
plain columnar ``select``s. The BatchParser is compiled lazily once per
executor process and cached by program identity (the specs are frozen /
hashable dataclasses).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampNTZType)

from ..rules.spec import RuleProgram
from .header import attr_fields_of
from .parse import BatchParser

# executor-side compiled-program cache (one compile per process)
_PARSER_CACHE: dict = {}


def _parser_for(program: RuleProgram) -> BatchParser:
    bp = _PARSER_CACHE.get(program)
    if bp is None:
        bp = BatchParser(program)
        _PARSER_CACHE[program] = bp
    return bp


def parsed_schema(program: RuleProgram) -> StructType:
    """Static struct schema for a program: universal fields + one typed
    field per attr the program's rules can produce."""
    fields = [
        StructField("rule_id", IntegerType()),
        StructField("ts", TimestampNTZType()),
        StructField("tz_sec", IntegerType()),
        StructField("message", StringType()),
        StructField("words", ArrayType(StringType())),
        StructField("symbols", ArrayType(StringType())),
        StructField("error", StringType()),
    ]
    for name, dtype in attr_fields_of(program.header_rules):
        fields.append(StructField(
            name, LongType() if dtype == "int" else StringType()))
    return StructType(fields)


def _to_struct_frame(out: pd.DataFrame, attr_schema) -> pd.DataFrame:
    """Cast the BatchParser frame to Arrow-friendly dtypes."""
    res = pd.DataFrame(index=out.index)
    res["rule_id"] = out["rule_id"].astype("int32")
    res["ts"] = out["ts"]
    res["tz_sec"] = out["tz_sec"].astype("Int64")
    res["message"] = out["message"]
    res["words"] = out["words"]
    res["symbols"] = out["symbols"]
    res["error"] = out["error"]
    for name, dtype in attr_schema:
        col = out[name]
        res[name] = col.astype("Int64") if dtype == "int" else col
    return res


def parse_udf(program: RuleProgram):
    """UDF of (text) → parsed struct, for programs with fully static
    defaults (no per-row year fill)."""
    schema = parsed_schema(program)
    attr_schema = attr_fields_of(program.header_rules)

    @pandas_udf(returnType=schema)
    def _parse(text: pd.Series) -> pd.DataFrame:
        bp = _parser_for(program)
        return _to_struct_frame(bp.parse(text), attr_schema)

    return _parse


def parse_udf_with_year(program: RuleProgram):
    """UDF of (text, year) → parsed struct; ``year`` feeds rules with the
    year_from_ts policy (year taken from the row's own ts column, the
    deterministic replacement for the reference's now().year default)."""
    schema = parsed_schema(program)
    attr_schema = attr_fields_of(program.header_rules)

    @pandas_udf(returnType=schema)
    def _parse(text: pd.Series, year: pd.Series) -> pd.DataFrame:
        bp = _parser_for(program)
        return _to_struct_frame(bp.parse(text, default_year=year), attr_schema)

    return _parse


_TOKENIZER_CACHE: dict = {}


def tokenize_words_udf(actions: tuple):
    """UDF of (statement) → array<string> words, running only the
    statement-action pipeline (no header cascade). ``actions`` must be the
    hashable tuple of Action specs."""
    from .tokenizer import VectorTokenizer

    @pandas_udf(returnType=ArrayType(StringType()))
    def _tok(statements: pd.Series) -> pd.Series:
        vt = _TOKENIZER_CACHE.get(actions)
        if vt is None:
            vt = VectorTokenizer(actions)
            _TOKENIZER_CACHE[actions] = vt
        words, _ = vt.run(statements)
        out = pd.Series(words, dtype=object)
        out[statements.isna().to_numpy()] = None
        return out

    return _tok


def tokenize_statement_udf(actions: tuple):
    """UDF of (statement) → struct<words, symbols> — statement-only
    parsing, the vectorized counterpart of the reference's
    ``process_statement`` / CLI ``--statement`` mode
    (``/root/reference/log2seq/__main__.py:79-80``)."""
    from .tokenizer import VectorTokenizer

    schema = StructType([
        StructField("words", ArrayType(StringType())),
        StructField("symbols", ArrayType(StringType())),
    ])

    @pandas_udf(returnType=schema)
    def _tok(statements: pd.Series) -> pd.DataFrame:
        vt = _TOKENIZER_CACHE.get(actions)
        if vt is None:
            vt = VectorTokenizer(actions)
            _TOKENIZER_CACHE[actions] = vt
        words, symbols = vt.run(statements)
        return pd.DataFrame({"words": pd.Series(words, dtype=object),
                             "symbols": pd.Series(symbols, dtype=object)})

    return _tok


def with_parsed(df: DataFrame, program: RuleProgram, text_col: str = "text",
                ts_col: Optional[str] = "ts",
                default_year: Optional[int] = None,
                out_col: str = "parsed",
                engine: str = "arrow") -> DataFrame:
    """Attach the parsed struct column to a DataFrame of raw lines.

    Rules with the year_from_ts policy take the year from ``ts_col``;
    for raw-line inputs with no timestamp column pass ``default_year``
    (the CLI defaults it to the wall-clock year, matching the reference
    CLI's now().year behavior).

    engine='arrow' (default) runs via mapInArrow with ListArrays built
    straight from the tokenizer's flat output (~17% faster than the
    pandas-UDF path, bit-identical); engine='pandas' keeps the scalar
    pandas UDF (used by the equality tests)."""
    if engine == "arrow":
        from .arrow_udf import with_parsed_arrow
        if ts_col is not None and ts_col not in df.columns:
            ts_col = None
        return with_parsed_arrow(df, program, text_col=text_col,
                                 ts_col=ts_col, default_year=default_year,
                                 out_col=out_col)
    needs_year = any(r.year_from_ts for r in program.header_rules)
    if needs_year and ts_col is not None:
        udf = parse_udf_with_year(program)
        return df.withColumn(out_col, udf(F.col(text_col), F.year(ts_col)))
    if needs_year and default_year is not None:
        udf = parse_udf_with_year(program)
        return df.withColumn(out_col,
                             udf(F.col(text_col), F.lit(int(default_year))))
    udf = parse_udf(program)
    return df.withColumn(out_col, udf(F.col(text_col)))
