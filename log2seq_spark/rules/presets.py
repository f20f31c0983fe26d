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
                   date_concat, time_concat, unixtime, year2, dsecond,
                   split, fix, fix_ip)


def _wallclock_year(default_year=None) -> int:
    """The reference example parsers freeze ``datetime.now().year`` at
    import; presets that mirror them take an explicit ``default_year``
    and fall back to the same wall-clock behavior."""
    if default_year is not None:
        return int(default_year)
    import datetime
    return datetime.datetime.now().year

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


def bgl_program() -> RuleProgram:
    """BGL supercomputer logs (mirrors the reference loghub_BGL example
    parser, ``example/loghub_BGL/parser.py:10-37``): dummy epoch + dotted
    date, the real dash-separated datetime group with decimal seconds, an
    optional statement, ignore_failure for the odd tail lines."""
    rule = HeaderRule(
        fields=(string("label", symbols="-"),
                digit("unixtime", dummy=True),
                group([digit("year", dummy=True), digit("month", dummy=True),
                       digit("day", dummy=True)], separator="."),
                string("host", symbols=":_-", dummy=True),
                group([digit("year"), digit("month"), digit("day"),
                       digit("hour"), digit("minute"), digit("second"),
                       dsecond()], separator="-."),
                string("host", symbols=":_-"),
                string("type"),
                string("component", symbols="_"),
                string("level"),
                statement(optional=True)))
    return RuleProgram(header_rules=(rule,), actions=default_actions(),
                       ignore_failure=True)


WINDOWS_FULLPATH_PATTERN = r"[A-Z]:(\\[a-zA-Z0-9.*?_-])+"


def windows_program() -> RuleProgram:
    """Windows CBS logs (reference ``example/loghub_Windows/parser.py``):
    ``<Date> <Time>, <Level>  <Component>  <Content>`` plus header-less
    continuation lines, and a custom statement pipeline protecting
    ``C:\\...`` full paths."""
    rule_main = HeaderRule(
        fields=(date(), time_of_day(), string("level"),
                string("component"), statement()),
        separator=" ,\t")
    rule_cont = HeaderRule(fields=(statement(),), reformat_timestamp=False)
    actions = (split(DEFAULT_SPLIT_SYMBOLS), fix_ip(),
               fix([TIME_TOKEN_PATTERN, MAC_TOKEN_PATTERN,
                    WINDOWS_FULLPATH_PATTERN]),
               split(":"))
    return RuleProgram(header_rules=(rule_main, rule_cont), actions=actions)


def linux_program(default_year=None) -> RuleProgram:
    """Linux syslog (reference ``example/loghub_Linux/parser.py``):
    ``<component>([pid])?: <content>`` pinned via full_format with a
    non-greedy component, plus a tag-less meta-line rule."""
    defaults = (("year", _wallclock_year(default_year)),)
    rule1 = HeaderRule(
        fields=(month_abbr(), digit("day"), time_of_day(), hostname("host"),
                user_field("component", r".+?"),
                digit("processid", optional=True), statement()),
        full_format=r"<0> <1> <2> <3> <4>(\[<5>\])?: <6>",
        defaults=defaults)
    rule2 = HeaderRule(
        fields=(month_abbr(), digit("day"), time_of_day(), hostname("host"),
                statement()),
        separator=" ", defaults=defaults)
    return RuleProgram(header_rules=(rule1, rule2), actions=default_actions())


def proxifier_program(default_year=None) -> RuleProgram:
    """Proxifier logs (reference ``example/loghub_Proxifier/parser.py``):
    ``[<month.day time>] <program> - <content>`` with " - " pinned via
    full_format (program names may contain '-'), plus a program-less
    rule."""
    defaults = (("year", _wallclock_year(default_year)),)
    ts = group([digit("month"), digit("day"), time_of_day()], separator=" .")
    rule1 = HeaderRule(
        fields=(ts, user_field("env", r".+?"), statement()),
        full_format=r"\[<0>\] <1> - <2>", defaults=defaults)
    rule2 = HeaderRule(fields=(ts, statement()),
                       separator="[] ", defaults=defaults)
    return RuleProgram(header_rules=(rule1, rule2), actions=default_actions())


def android_program(default_year=None) -> RuleProgram:
    """Android logcat (reference ``example/loghub_Android/parser.py``):
    ``<month-day> <time> <pid> <tid> <level> <component>: <content>``."""
    defaults = (("year", _wallclock_year(default_year)),)
    rule = HeaderRule(
        fields=(group([digit("month"), digit("day")], separator="-"),
                time_of_day(), digit("pid"), digit("tid"),
                user_field("level", r"[A-Z]"),
                user_field("component", r"[^:]+"), statement()),
        separator=":\t ", defaults=defaults)
    return RuleProgram(header_rules=(rule,), actions=default_actions())


def hadoop_program() -> RuleProgram:
    """Hadoop logs (reference ``example/loghub_Hadoop/parser.py``):
    ``<date> <h:m:s,ds> <LEVEL> [<process>] <component>: <content>`` via
    full_format, plus a header-less continuation rule."""
    rule1 = HeaderRule(
        fields=(date(),
                group([digit("hour"), digit("minute"), digit("second"),
                       dsecond()], separator=":,"),
                string("level"), user_field("process", r".+"),
                user_field("component", r"[a-zA-Z0-9.]+"), statement()),
        full_format=r"<0> <1> <2> \[<3>\] <4>: <5>")
    rule2 = HeaderRule(fields=(statement(),), reformat_timestamp=False)
    return RuleProgram(header_rules=(rule1, rule2), actions=default_actions())


def healthapp_program() -> RuleProgram:
    """HealthApp logs (reference ``example/loghub_HealthApp/parser.py``):
    '|'-separated fields; the ambiguous digit date is kept raw
    (reformat_timestamp=False, like the reference)."""
    rule = HeaderRule(
        fields=(group([user_field("datestring", "[0-9]+"), digit("hour"),
                       digit("minute"), digit("second"), dsecond()],
                      separator=":-"),
                user_field("component", r"[a-zA-Z0-9_]+"),
                digit("processid"), statement()),
        separator="|", reformat_timestamp=False)
    return RuleProgram(header_rules=(rule,), actions=default_actions())


def mac_program(default_year=None) -> RuleProgram:
    """Mac system logs (reference ``example/loghub_Mac/parser.py``):
    ``<Month> <Day> <Time> <host> <component>[<pid>]( (<addr>))?: <msg>``
    via full_format, a '---'-tagged rule, and a catch-all tail."""
    defaults = (("year", _wallclock_year(default_year)), ("host", None))
    rule1 = HeaderRule(
        fields=(month_abbr(), digit("day"), time_of_day(), hostname("host"),
                user_field("component", r".+?"), digit("processid"),
                user_field("address", r"[^)]*", optional=True, dummy=True),
                statement()),
        full_format=r"<0> <1> <2> <3> <4>\[<5>\]( \(<6>\))?: <7>",
        defaults=defaults)
    rule2 = HeaderRule(
        fields=(month_abbr(), digit("day"), time_of_day(),
                user_field("dummy", r"---"), statement()),
        separator=" :[]", defaults=defaults)
    rule3 = HeaderRule(fields=(statement(),), separator=" \t",
                       reformat_timestamp=False)
    return RuleProgram(header_rules=(rule1, rule2, rule3),
                       actions=default_actions())


def openstack_program() -> RuleProgram:
    """OpenStack logs (reference ``example/loghub_OpenStack/parser.py``):
    ``<file> <date> <time> <pid> <LEVEL> <module> [<ctx>] <content>`` via
    full_format, plus a header-less continuation rule."""
    rule1 = HeaderRule(
        fields=(user_field("", r"[^ ]+", dummy=True), date(), time_of_day(),
                digit("processid"), string("level"), hostname("host"),
                user_field("addr", r"[a-zA-Z0-9 -]+"), statement()),
        full_format=r"<0> <1> <2> <3> <4> <5> \[<6>\] <7>")
    rule2 = HeaderRule(fields=(statement(),), reformat_timestamp=False)
    return RuleProgram(header_rules=(rule1, rule2), actions=default_actions())


def thunderbird_program() -> RuleProgram:
    """Thunderbird supercomputer syslog (reference
    ``example/loghub_Thunderbird/parser.py``): label + epoch + dotted
    date envelope, then ``<component>([pid])?: <content>`` via
    full_format, plus a tag-less meta-line rule."""
    prefix = (user_field("label", r"-|[A-Z]+"),
              digit("unixtime", dummy=True),
              group([digit("year"), digit("month", dummy=True),
                     digit("day", dummy=True)], separator="."),
              user_field("host", r"[a-zA-Z0-9:#-]+"),
              month_abbr(), digit("day"), time_of_day(),
              user_field("location", r"[a-zA-Z0-9/@#-]+", dummy=True))
    rule1 = HeaderRule(
        fields=prefix + (user_field("component", r".+?"),
                         digit("processid", optional=True), statement()),
        full_format=r"<0> <1> <2> <3> <4> <5> <6> <7> <8>(\[<9>\])?: <10>")
    rule2 = HeaderRule(fields=prefix + (statement(),))
    return RuleProgram(header_rules=(rule1, rule2), actions=default_actions())


def zookeeper_program() -> RuleProgram:
    """Zookeeper logs (reference ``example/loghub_Zookeeper/parser.py``):
    ``<date> <h:m:s,ds> - <LEVEL>  [<component>] - <content>`` via
    full_format."""
    rule = HeaderRule(
        fields=(date(),
                group([digit("hour"), digit("minute"), digit("second"),
                       dsecond()], separator=":,"),
                string("level"), user_field("component", r".*"),
                statement()),
        full_format=r"<0> <1> - <2>  \[<3>\] - <4>")
    return RuleProgram(header_rules=(rule,), actions=default_actions())


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
