"""Batch parse = vectorized header cascade + vectorized tokenizer.

The single entry point the Spark UDF layer wraps: one Arrow batch of raw
``text`` in, one typed frame (header fields + words/symbols) out. Text
crosses the JVM↔Python Arrow boundary exactly once (SURVEY.md §4.2 "UDF
fusion").
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from ..rules.spec import RuleProgram
from .header import VectorHeaderParser
from .tokenizer import VectorTokenizer


class BatchParser:
    """Compiled program, reusable across Arrow batches (built once per
    executor via the UDF closure)."""

    def __init__(self, program: RuleProgram):
        self.program = program
        self.header = VectorHeaderParser(program.header_rules)
        self.tokenizer = VectorTokenizer(program.actions)

    @property
    def attr_schema(self):
        return self.header.attr_schema

    def parse(self, texts: pd.Series,
              default_year: Optional[pd.Series] = None) -> pd.DataFrame:
        """→ frame with rule_id, ts, tz_sec, message, words, symbols,
        error + one column per attr. Failed / empty rows keep null
        message/words/symbols."""
        out = self.header.run(texts, default_year=default_year)
        ok = out["message"].notna()
        words = pd.Series([None] * len(out), dtype=object)
        symbols = pd.Series([None] * len(out), dtype=object)
        if ok.any():
            w, s = self.tokenizer.run(out.loc[ok, "message"])
            words[ok.to_numpy()] = pd.Series(w, index=out.index[ok], dtype=object)
            symbols[ok.to_numpy()] = pd.Series(s, index=out.index[ok], dtype=object)
        out["words"] = words
        out["symbols"] = symbols
        return out
