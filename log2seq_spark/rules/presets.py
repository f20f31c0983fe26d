"""Preset rule programs — the engine's standard library.

Mirrors the reference presets (``/root/reference/log2seq/preset.py``):
the default syslog-ish program (preset.py:15-89) and the Apache error-log
program (preset.py:92-149). The reference's nondeterministic
``datetime.now().year`` default (preset.py:51) is replaced by the
``year_from_ts`` policy: the year of the row's own ``ts`` column
(documented divergence, pinned by tests).
"""

from __future__ import annotations

from .spec import (Action, HeaderRule, RuleProgram, statement, digit, string,
                   hostname, user_field, date, time_of_day, group, month_abbr,
                   date_concat, time_concat, unixtime, year2,
                   split, fix, fix_ip)

# self-anchored patterns used by the default statement pipeline
# (reference preset.py:11-12)
TIME_TOKEN_PATTERN = r"^\d{2}:\d{2}:\d{2}(\.\d+)?$"
MAC_TOKEN_PATTERN = r"^([0-9a-fA-F]{2}:){5}[0-9a-fA-F]{2}$"

DEFAULT_SPLIT_SYMBOLS = '"' + "()[]{}|+',=><;`# "


def default_header_rules(default_year=None) -> tuple:
    """Two ordered header rules: syslogd-style, then ISO-style
    (reference preset.py:15-52)."""
    defaults = () if default_year is None else (("year", default_year),)
    rule_syslog = HeaderRule(
        fields=(digit("year", optional=True), month_abbr(), digit("day"),
                time_of_day(), hostname("host"), statement()),
        defaults=defaults, year_from_ts=default_year is None)
    rule_iso = HeaderRule(
        fields=(date(), time_of_day(), hostname("host"), statement()),
        defaults=defaults, year_from_ts=default_year is None)
    return (rule_syslog, rule_iso)


def default_actions() -> tuple:
    """Split on standard symbols → protect IPs → protect times/MACs →
    split on ':' (reference preset.py:55-75)."""
    return (split(DEFAULT_SPLIT_SYMBOLS),
            fix_ip(),
            fix([TIME_TOKEN_PATTERN, MAC_TOKEN_PATTERN]),
            split(":"))


def default_program(default_year=None, ignore_failure: bool = False) -> RuleProgram:
    return RuleProgram(header_rules=default_header_rules(default_year),
                       actions=default_actions(),
                       ignore_failure=ignore_failure)


def apache_errorlog_program() -> RuleProgram:
    """Apache 2.2 / 2.4 error-log formats (reference preset.py:92-149)."""
    ts_group = group([string("weekday", dummy=True), month_abbr(),
                      digit("day"), time_of_day(), digit("year")],
                     separator=" ")
    rule_22 = HeaderRule(
        fields=(ts_group,
                string("severityname"),
                group([user_field("client", r"client", dummy=True),
                       hostname("host", optional=True)],
                      separator=None, optional=True),
                statement()),
        separator=" []")
    rule_24 = HeaderRule(
        fields=(ts_group,
                group([string("modulename", symbols="_"),
                       string("severityname")], separator=":"),
                group([user_field("pid", r"pid", dummy=True),
                       digit("processid"),
                       user_field("tid", r"tid", dummy=True),
                       digit("threadid")], separator=": "),
                group([user_field("client", r"client", dummy=True),
                       hostname("host")], separator=None, optional=True),
                statement()),
        separator=" []")
    return RuleProgram(header_rules=(rule_22, rule_24),
                       actions=default_actions())


def hdfs_program() -> RuleProgram:
    """HDFS-style ``ddmmyy hhmmss pid LEVEL component: message`` lines
    (mirrors the reference loghub_HDFS example parser: DateConcat with
    no_century, TimeConcat, ':'-bearing separator)."""
    rule = HeaderRule(
        fields=(date_concat(no_century=True), time_concat(),
                digit("processid"), string("level"),
                user_field("component", r"[a-zA-Z0-9.$]+"), statement()),
        separator=" :")
    return RuleProgram(header_rules=(rule,), actions=default_actions())


def hpc_program() -> RuleProgram:
    """HPC-style lines with an epoch timestamp kept raw
    (reformat_timestamp=False + ignore_failure, like the reference
    loghub_HPC example parser)."""
    rule = HeaderRule(
        fields=(digit("logid"), string("class", optional=True),
                user_field("node", r"[a-zA-Z0-9-]+", optional=True),
                user_field("component", r"[a-zA-Z._-]+"),
                user_field("state", r"[a-zA-Z._-]+"),
                unixtime(), user_field("flag", r"[0-9-]+"), statement()),
        reformat_timestamp=False)
    return RuleProgram(header_rules=(rule,), actions=default_actions(),
                       ignore_failure=True)


def spark_log_program() -> RuleProgram:
    """Spark-log-style ``yy/mm/dd hh:mm:ss LEVEL component: message``
    with a catch-all fallback rule (multi-rule first-match-wins with a
    reformat_timestamp=False tail, like the reference loghub_Spark
    example parser)."""
    rule1 = HeaderRule(
        fields=(group([year2(), digit("month"), digit("day")], separator="/"),
                time_of_day(), string("level"),
                user_field("component", r"[a-zA-Z0-9.]+"), statement()),
        separator=" :")
    fallback = HeaderRule(fields=(statement(),), reformat_timestamp=False)
    return RuleProgram(header_rules=(rule1, fallback),
                       actions=default_actions())
