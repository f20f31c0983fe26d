"""Declarative parse-rule specs, regex synthesis, and the pure-Python
semantics oracle for the log2seq-spark engine."""

from .spec import (UNKNOWN, FIXED, SEP, Action, HeaderField, HeaderRule,
                   RuleProgram, RuleDefinitionError, ParseFailure,
                   statement, digit, string, hostname, user_field, date,
                   time_of_day, iso_datetime, date_concat, time_concat,
                   year2, month_abbr, dsecond, tzone, unixtime, group,
                   split, fix, fix_ip, remove, fix_partial, fix_parenthesis,
                   remove_partial, conditional_split)
from .synthesis import compile_header_rule, CompiledHeaderRule
from .engine import LineEngine, tokenize_statement, compile_actions, separate
from . import presets

__all__ = [
    "UNKNOWN", "FIXED", "SEP", "Action", "HeaderField", "HeaderRule",
    "RuleProgram", "RuleDefinitionError", "ParseFailure",
    "statement", "digit", "string", "hostname", "user_field", "date",
    "time_of_day", "iso_datetime", "date_concat", "time_concat",
    "year2", "month_abbr", "dsecond", "tzone", "unixtime", "group",
    "split", "fix", "fix_ip", "remove", "fix_partial", "fix_parenthesis",
    "remove_partial", "conditional_split",
    "compile_header_rule", "CompiledHeaderRule",
    "LineEngine", "tokenize_statement", "compile_actions", "separate",
    "presets",
]
