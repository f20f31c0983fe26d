"""log2seq-spark: a PySpark-native parse → enrich → route → aggregate
engine with the query/data-processing capabilities of amulog/log2seq,
re-expressed Spark-first (DataFrame plans + Arrow-vectorized UDFs).

The top level mirrors the reference package's public API
(``/root/reference/log2seq/__init__.py``) so reference users can switch
imports: ``init_parser`` / ``LogParser`` / ``load_parser_script``, the
``KEY_*`` record keys, and the two exception types. These are the
driver-side single-line surface; the distributed path is
:func:`log2seq_spark.functions.udf.with_parsed` over DataFrames and the
``plans.pipeline`` module.
"""

from typing import Optional

from .rules.spec import ParseFailure, RuleDefinitionError, RuleProgram

__version__ = "0.1.0"

# reference names (_common.py:14-28) for the same conditions
ParserDefinitionError = RuleDefinitionError
LogParseFailure = ParseFailure

# record keys (reference _common.py:6-9)
KEY_TIMESTAMP = "timestamp"
KEY_STATEMENT = "message"
KEY_WORDS = "words"
KEY_SYMBOLS = "symbols"


class LogParser:
    """Drop-in for the reference's ``LogParser`` (_common.py:31-163):
    single-line ``process_header`` / ``process_statement`` /
    ``process_line`` over a compiled :class:`RuleProgram`. This is the
    driver-side convenience surface; DataFrames go through the
    Arrow-vectorized UDF instead."""

    def __init__(self, program: Optional[RuleProgram] = None,
                 default_year: Optional[int] = None):
        from .rules.engine import LineEngine
        from .rules.presets import default_program, _wallclock_year
        # reference parity: rules that take the year from wall clock
        # (year_from_ts) fall back to datetime.now().year when no
        # explicit default_year is given (_common.py via preset.py:15-52)
        self._engine = LineEngine(program or default_program(),
                                  _wallclock_year(default_year))
        self.program = self._engine.program

    def process_header(self, line: str, verbose: bool = False) -> dict:
        """Header-cascade parse only (reference _common.py:85-116);
        raises :class:`LogParseFailure` when no rule matches.
        ``verbose`` prints per-rule match progress in the reference's
        ``header rule N: match|mismatch`` format."""
        _rule_id, record = self._engine.parse_header(line, verbose)
        return record

    def process_statement(self, statement: str, verbose: bool = False):
        """Tokenize a statement → (words, symbols)
        (reference _common.py:118-131). ``verbose`` prints the statement
        and per-action part progress (reference statement.py:44-54
        format; the FixPartial-shaped sugars all print ``FixPartial``)."""
        from .rules.engine import tokenize_statement
        return tokenize_statement(self._engine.actions, statement, verbose)

    def process_line(self, line: str, verbose: bool = False) -> Optional[dict]:
        """Full parse of one line (reference _common.py:133-163): None
        for empty lines (and failures when the program sets
        ``ignore_failure``), else a dict with the header items plus
        ``message`` / ``words`` / ``symbols``."""
        d = self._engine.parse_line(line, verbose)
        if d is not None:
            d.pop("rule_id", None)
        return d


def init_parser(program: Optional[RuleProgram] = None,
                default_year: Optional[int] = None) -> LogParser:
    """Reference ``init_parser`` equivalent (_common.py:166-187): no
    arguments → the default preset program."""
    return LogParser(program, default_year)


def grok_program(expressions, **kwargs) -> RuleProgram:
    """Grok front-end (north rule: "grok/regex parse"): compile one or
    more ``%{SYNTAX:semantic}`` expressions into a :class:`RuleProgram`
    running on the same vectorized machinery as item-built rules. See
    :mod:`log2seq_spark.rules.grok`."""
    from .rules.grok import grok_program as _gp
    return _gp(expressions, **kwargs)


def load_parser_script(script_filepath: str) -> RuleProgram:
    """Load a user parser script by path (reference convention,
    _common.py:190-205): a python module exporting a module-global
    ``program: RuleProgram``."""
    from .__main__ import load_program_script
    return load_program_script(script_filepath)


__all__ = [
    "LogParser", "init_parser", "load_parser_script", "grok_program",
    "RuleProgram",
    "ParserDefinitionError", "LogParseFailure",
    "RuleDefinitionError", "ParseFailure",
    "KEY_TIMESTAMP", "KEY_STATEMENT", "KEY_WORDS", "KEY_SYMBOLS",
]
