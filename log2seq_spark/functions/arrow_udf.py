"""Arrow-native parse binding: ``DataFrame.mapInArrow`` instead of a
scalar pandas UDF.

The pandas-UDF path pays for converting per-row python ``list``s of
words/symbols into Arrow ListArrays. Here the tokenizer's flat output
(value array + end offsets) feeds ``pa.ListArray.from_arrays`` directly,
and all passthrough columns cross untouched (zero-copy slices of the
input RecordBatch). Same parse semantics — the header cascade and the
token-frame engine are shared with the pandas path.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..rules.spec import RuleProgram
from .header import attr_fields_of
from .parse import BatchParser
from .udf import _PARSER_CACHE, parsed_schema


def _parser_for(program: RuleProgram) -> BatchParser:
    bp = _PARSER_CACHE.get(program)
    if bp is None:
        bp = BatchParser(program)
        _PARSER_CACHE[program] = bp
    return bp


def _list_array(flat: np.ndarray, ends: np.ndarray,
                valid: np.ndarray) -> pa.ListArray:
    """ListArray from flat values + inclusive end offsets; rows where
    ``valid`` is False become null lists."""
    n = len(ends)
    offsets = np.zeros(n + 1, dtype=np.int32)
    offsets[1:] = ends
    # a null at offsets[i] marks list i null; the final offset must stay
    # non-null (Arrow ListArray.from_arrays convention)
    off = pa.array(offsets, type=pa.int32(),
                   mask=np.concatenate((~valid, [False])))
    values = pa.array(flat.tolist(), type=pa.string())
    return pa.ListArray.from_arrays(off, values)


def _parse_batch_to_struct(program: RuleProgram, texts: pd.Series,
                           years: Optional[pd.Series]) -> pa.StructArray:
    bp = _parser_for(program)
    hdr = bp.header.run(texts, default_year=years)
    ok = hdr["message"].notna()
    ok_np = ok.to_numpy(dtype=bool)

    # tokenize only ok rows; scatter flat offsets back to full batch
    n = len(hdr)
    w_ends_full = np.zeros(n, dtype=np.int64)
    s_ends_full = np.zeros(n, dtype=np.int64)
    if ok_np.any():
        wf, we, sf, se = bp.tokenizer.run_flat(hdr.loc[ok, "message"])
        w_ends_full[ok_np] = we
        s_ends_full[ok_np] = se
        # carry forward the running offset across non-ok gaps
        w_ends_full = np.maximum.accumulate(w_ends_full)
        s_ends_full = np.maximum.accumulate(s_ends_full)
    else:
        wf = np.empty(0, dtype=object)
        sf = np.empty(0, dtype=object)

    arrays = [
        pa.array(hdr["rule_id"].to_numpy(np.int32)),
        pa.array(hdr["ts"], from_pandas=True).cast(pa.timestamp("us")),
        pa.array(hdr["tz_sec"], type=pa.int32(), from_pandas=True),
        pa.array(hdr["message"], type=pa.string(), from_pandas=True),
        _list_array(wf, w_ends_full, ok_np),
        _list_array(sf, s_ends_full, ok_np),
        pa.array(hdr["error"], type=pa.string(), from_pandas=True),
    ]
    names = ["rule_id", "ts", "tz_sec", "message", "words", "symbols",
             "error"]
    for name, dtype in bp.attr_schema:
        col = hdr[name]
        if dtype == "int":
            arrays.append(pa.array(pd.to_numeric(col), type=pa.int64(),
                                   from_pandas=True))
        else:
            arrays.append(pa.array(col, type=pa.string(), from_pandas=True))
        names.append(name)
    return pa.StructArray.from_arrays(arrays, names=names)


def with_parsed_arrow(df: DataFrame, program: RuleProgram,
                      text_col: str = "text",
                      ts_col: Optional[str] = "ts",
                      default_year: Optional[int] = None,
                      out_col: str = "parsed") -> DataFrame:
    """mapInArrow twin of ``with_parsed`` — identical output schema."""
    from pyspark.sql.types import StructField
    needs_year = any(r.year_from_ts for r in program.header_rules)
    spark_struct = parsed_schema(program)
    out_schema = StructType(df.schema.fields
                            + [StructField(out_col, spark_struct)])

    cols = list(df.columns)
    text_idx = cols.index(text_col)
    ts_idx = cols.index(ts_col) if (needs_year and ts_col in cols) else None

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            texts = rb.column(text_idx).to_pandas()
            years = None
            if ts_idx is not None:
                years = pd.Series(
                    pd.to_datetime(rb.column(ts_idx).to_pandas())
                      .dt.year.astype("float64").to_numpy())
            elif needs_year and default_year is not None:
                years = pd.Series(np.full(len(texts), float(default_year)))
            parsed = _parse_batch_to_struct(program, texts, years)
            yield pa.RecordBatch.from_arrays(
                [rb.column(i) for i in range(rb.num_columns)] + [parsed],
                names=cols + [out_col])

    return df.mapInArrow(mapper, schema=out_schema)


def _to_arrow(spark_type) -> pa.DataType:
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StringType, TimestampNTZType)
    if isinstance(spark_type, IntegerType):
        return pa.int32()
    if isinstance(spark_type, LongType):
        return pa.int64()
    if isinstance(spark_type, StringType):
        return pa.string()
    if isinstance(spark_type, TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(spark_type, ArrayType):
        return pa.list_(_to_arrow(spark_type.elementType))
    raise TypeError(f"unmapped type {spark_type}")
