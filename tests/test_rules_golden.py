"""Golden tests ported from the reference suite, asserted against the
pure-Python oracle engine.

Sources: /root/reference/tests/test_statement.py, test_header.py,
test_parser.py — same inputs, same expected values, byte-for-byte.
"""

import datetime

import pytest

from log2seq_spark.rules import (LineEngine, RuleProgram, HeaderRule,
                                 compile_actions, tokenize_statement,
                                 statement, digit, string, hostname,
                                 user_field, date, time_of_day, month_abbr,
                                 year2, date_concat, tzone, unixtime, dsecond,
                                 split, fix, fix_ip, remove, fix_partial,
                                 fix_parenthesis, remove_partial,
                                 conditional_split, ParseFailure)
from log2seq_spark.rules.engine import (tz_to_offset_seconds,
                                        fraction_to_microseconds,
                                        pick_field_value)
from log2seq_spark.rules.presets import default_program, apache_errorlog_program
from log2seq_spark.rules.synthesis import compile_header_rule


def toks(actions, text):
    return tokenize_statement(compile_actions(actions), text)


# -- statement actions (reference tests/test_statement.py) -------------------

class TestStatementGolden:
    def test_default_pipeline(self):
        w, s = toks(default_program().actions,
                    "system[12345]: host 2001:0db8:1234::1 (interface:eth0) disconnected")
        assert w == ["system", "12345", "host", "2001:0db8:1234::1",
                     "interface", "eth0", "disconnected"]
        assert s == ["", "[", "]: ", " ", " (", ":", ") ", ""]

    def test_empty(self):
        w, s = toks(default_program().actions, " ")
        assert w == []
        assert s == [" "]

    def test_fix_ip_double_colon(self):
        w, _ = toks([split(" "), fix_ip(), split(":")],
                    "tests: src :: is not link-local")
        assert w == ["tests", "src", "::", "is", "not", "link-local"]

    def test_remove(self):
        w, _ = toks([split(" >"), remove("[^a-zA-Z0-9]+")], "a -> b")
        assert w == ["a", "b"]

    def test_fix_multiple_patterns(self):
        w, _ = toks([split(" "),
                     fix([r"\d+\.\d+\.\d+", r"([0-9a-f]{2}:){5}[0-9a-f]{2}"]),
                     split(":")],
                    "ver 1.2.3 mac de:ad:be:ef:00:11 ok")
        assert w == ["ver", "1.2.3", "mac", "de:ad:be:ef:00:11", "ok"]

    def test_fix_partial_ip_port(self):
        w, _ = toks([split(" "),
                     fix_partial(r'^(?P<ipaddr>(\d{1,3}\.){3}\d{1,3})\.(?P<port>\d{1,5})$',
                                 fix_groups=["ipaddr", "port"]),
                     split(".")],
                    "source 192.0.2.1.80 initialized.")
        assert w == ["source", "192.0.2.1", "80", "initialized"]

    def test_fix_parenthesis_twice_and_recursive(self):
        line = 'comment added: "This is a comment description" "This is second desc".'
        expected = ["comment", "added", "This is a comment description",
                    "This is second desc"]
        w, _ = toks([fix_parenthesis(['"', '"']), fix_parenthesis(['"', '"']),
                     split(' .:"')], line)
        assert w == expected
        w, _ = toks([fix_parenthesis(['"', '"'], recursive=True),
                     split(' .:"')], line)
        assert w == expected

    def test_remove_partial(self):
        w, _ = toks([split(" "),
                     remove_partial(r'^.*[^:](?P<colon>:)$', remove_groups=["colon"]),
                     remove_partial(r'^.*[^.](?P<dot>\.)$', remove_groups=["dot"]),
                     fix(r'^\d{2}:\d{2}:\d{2}\.\d{3}$'),
                     fix_ip(),
                     split(":")],
                    "2000 Mar 4 12:34:56.789: host: :: and 127.0.0.1 "
                    "duplicated timestamp given.")
        assert w == ["2000", "Mar", "4", "12:34:56.789", "host", "::", "and",
                     "127.0.0.1", "duplicated", "timestamp", "given"]

    def test_conditional_split(self):
        w, _ = toks([split(" ()"),
                     remove_partial(r'^.*[^:](?P<colon>:)$', remove_groups=["colon"]),
                     conditional_split(r'^%[A-Z]+-\d+(-[A-Z]+-\d+)?$', r'%-')],
                    "%KERNEL-4-EVENT-7: host h1-i2.example.org scored -0.035 "
                    "value (20.0%)")
        assert w == ["KERNEL", "4", "EVENT", "7", "host", "h1-i2.example.org",
                     "scored", "-0.035", "value", "20.0%"]

    def test_docstring_fix_example(self):
        w, s = toks([split(" "), fix(r".+\.txt"), split(".")],
                    "parsing sample.txt done.")
        assert (w, s) == (["parsing", "sample.txt", "done"], ["", " ", " ", "."])

    def test_reconstruction_invariant(self):
        lines = [
            "system[12345]: host 2001:0db8:1234::1 (interface:eth0) disconnected",
            "source 192.0.2.1.80 initialized.",
            'comment added: "This is a comment description" "x".',
            " ", "", "a -> b", ":::", "a  b   c",
        ]
        acts = compile_actions(default_program().actions)
        for line in lines:
            w, s = tokenize_statement(acts, line)
            assert len(s) == len(w) + 1
            rebuilt = s[0] + "".join(word + sym for word, sym in zip(w, s[1:]))
            assert rebuilt == line


# -- header parsing (reference tests/test_header.py) -------------------------

class TestHeaderGolden:
    def setup_method(self):
        self.engine = LineEngine(default_program(), default_year=2020)

    def test_syslog_basic(self):
        _, r = self.engine.parse_header("Apr  1 02:23:45 host-name.example.org message here")
        assert r["host"] == "host-name.example.org"
        assert r["message"] == "message here"
        ts = r["timestamp"]
        assert (ts.month, ts.day, ts.hour, ts.minute, ts.second) == (4, 1, 2, 23, 45)

    def test_syslog_ipv6_microsecond_tz(self):
        _, r = self.engine.parse_header("Jun 30 11:11:11.012345+09:00 2001:db8::beef something")
        assert r["host"] == "2001:db8::beef"
        assert r["message"] == "something"
        ts = r["timestamp"]
        assert (ts.month, ts.day, ts.hour, ts.minute, ts.second, ts.microsecond) \
            == (6, 30, 11, 11, 11, 12345)
        assert ts.utcoffset() == datetime.timedelta(hours=9)

    def test_syslog_negative_tz(self):
        _, r = self.engine.parse_header("Jul 12 22:22:22-06:00 host something")
        assert r["timestamp"].utcoffset() == datetime.timedelta(hours=-6)

    def test_syslog_explicit_year(self):
        _, r = self.engine.parse_header("2020 May  2 22:22:22 192.0.2.1 message there")
        assert r["host"] == "192.0.2.1"
        assert r["timestamp"] == datetime.datetime(2020, 5, 2, 22, 22, 22)

    def test_iso_rule(self):
        rid, r = self.engine.parse_header("2112-09-03 11:22:33 host something failure")
        assert rid == 1
        assert r["message"] == "something failure"
        assert r["timestamp"] == datetime.datetime(2112, 9, 3, 11, 22, 33)

    def test_iso_microsecond_tz(self):
        _, r = self.engine.parse_header("2112-09-03 01:02:03.987654+09:00 host something")
        ts = r["timestamp"]
        assert ts.replace(tzinfo=None) == datetime.datetime(2112, 9, 3, 1, 2, 3, 987654)
        assert ts.utcoffset() == datetime.timedelta(hours=9)

    def test_iso_microsecond(self):
        _, r = self.engine.parse_header("2112-09-03 11:22:33.012345 host something failure")
        ts = r["timestamp"]
        assert ts.date() == datetime.date(2112, 9, 3)
        assert (ts.hour, ts.minute, ts.second, ts.microsecond) == (11, 22, 33, 12345)

    def test_full_format(self):
        rule = HeaderRule(
            fields=(month_abbr(), digit("day"), time_of_day(), hostname("host"),
                    string("function"), digit("pid", optional=True), statement()),
            full_format=r"<0> <1> <2> <3> <4>(\[<5>\])?: <6>",
            defaults=(("year", 2020),))
        eng = LineEngine(RuleProgram((rule,), default_program().actions))
        for line in ["Sep  1 01:02:03 host daemon[12345]: test: message ::1",
                     "Sep 12 11:22:33 host doraemon: restart"]:
            _, r = eng.parse_header(line)
            assert r is not None

    def test_optional_item_omitted_when_absent(self):
        rule = HeaderRule(
            fields=(month_abbr(), digit("day"), time_of_day(),
                    hostname("host", optional=True), statement()),
            full_format=r"<0> <1> <2>( <3>)?: <4>",
            defaults=(("year", 2020),))
        eng = LineEngine(RuleProgram((rule,), ()))
        _, with_host = eng.parse_header("Sep  1 01:02:03 myhost: hello")
        assert with_host["host"] == "myhost"
        _, without_host = eng.parse_header("Sep  1 01:02:03: hello")
        assert "host" not in without_host

    def test_separate_timezone_item(self):
        rule = HeaderRule(fields=(date(), time_of_day(), tzone(),
                                  hostname("host"), statement()),
                          separator=" ")
        eng = LineEngine(RuleProgram((rule,), ()))
        jst = datetime.timezone(datetime.timedelta(hours=9))
        _, r = eng.parse_header("2020-05-02 11:22:33 +09:00 host the message")
        assert r["timestamp"] == datetime.datetime(2020, 5, 2, 11, 22, 33, tzinfo=jst)
        assert "tz" not in r and "tzinfo" not in r
        _, r2 = eng.parse_header("2020-05-02 11:22:33 Z host msg")
        assert r2["timestamp"].tzinfo == datetime.timezone.utc

    def test_no_match_raises(self):
        with pytest.raises(ParseFailure):
            self.engine.parse_header("GARBAGE no header at all !!")


# -- item-level typed conversions (reference tests/test_header.py:94-229) ----

class TestItemTestHelper:
    """HeaderField.test — the reference's rule-debugging surface
    (reference header.py:390-402): anchored single-field match."""

    def test_matches_and_rejects(self):
        from log2seq_spark.rules.spec import (digit, hostname, time_of_day,
                                              month_abbr, user_field)
        assert digit("pid").test("123")
        assert digit("pid").test("12a") is None
        assert hostname("host").test("a.example.org")
        assert hostname("host").test("not a host!") is None
        assert time_of_day().test("12:34:56")
        assert time_of_day().test("99zz") is None
        assert month_abbr().test("Jan")
        assert user_field("x", r"[A-Z]+").test("ABC")
        assert user_field("x", r"[A-Z]+").test("abc") is None

    def test_named_group_like_reference(self):
        # reference Item.test returns a match whose named group carries
        # the field value; mirror that
        from log2seq_spark.rules.spec import digit
        mo = digit("pid").test("42")
        assert mo.group("pid") == "42"

    def test_parity_with_reference_item_test(self):
        import sys
        sys.path.insert(0, "/root/reference")
        from log2seq.header import Digit, Hostname, Time
        from log2seq_spark.rules.spec import digit, hostname, time_of_day
        cases = [
            (Digit("d"), digit("d"),
             ["7", "0042", "x7", "", "4.2"]),
            (Hostname("h"), hostname("h"),
             ["example.org", "1.2.3.4", "::1", "no spaces here"]),
            (Time(), time_of_day(),
             ["01:02:03", "1:2:3", "01:02:03.456", "25x"]),
        ]
        for ref_item, our_field, inputs in cases:
            for s in inputs:
                assert (ref_item.test(s) is not None) == \
                    (our_field.test(s) is not None), (our_field.kind, s)


class TestItemConversions:
    @staticmethod
    def _pick(field_spec, text):
        import re
        from log2seq_spark.rules.synthesis import field_regex
        mo = re.compile("^" + field_regex(field_spec) + "$").match(text)
        assert mo is not None
        return pick_field_value(field_spec, mo)

    def test_year_without_century(self):
        assert self._pick(year2(), "21") == 2021
        assert self._pick(year2(), "99") == 2099
        assert self._pick(year2(century=19), "21") == 1921

    def test_date_concat(self):
        assert self._pick(date_concat(no_century=True), "210905") == datetime.date(2021, 9, 5)
        assert self._pick(date_concat(no_century=True, century=19), "210905") == datetime.date(1921, 9, 5)
        assert self._pick(date_concat(), "19990905") == datetime.date(1999, 9, 5)

    def test_timezone(self):
        assert tz_to_offset_seconds("Z") == 0
        assert tz_to_offset_seconds("+0900") == 9 * 3600
        assert tz_to_offset_seconds("+09:00") == 9 * 3600
        assert tz_to_offset_seconds("-06:00") == -6 * 3600
        assert self._pick(tzone(), "Z") == datetime.timezone.utc
        assert self._pick(tzone(), "+0900") == datetime.timezone(datetime.timedelta(hours=9))

    def test_microsecond(self):
        assert fraction_to_microseconds("1") == 100000
        assert fraction_to_microseconds("012345") == 12345
        assert fraction_to_microseconds("123456") == 123456
        assert fraction_to_microseconds("1234567") == 123456
        assert self._pick(time_of_day(), "01:02:03.000001").microsecond == 1
        assert self._pick(time_of_day(), "01:02:03.5").microsecond == 500000

    def test_unixtime(self):
        assert self._pick(unixtime(), "1551024123") == \
            datetime.datetime(2019, 2, 24, 16, 2, 3, tzinfo=datetime.timezone.utc)
        jst = datetime.timezone(datetime.timedelta(hours=9))
        assert self._pick(unixtime(tz_offset_sec=9 * 3600), "1551024123") == \
            datetime.datetime(2019, 2, 25, 1, 2, 3, tzinfo=jst)

    def test_hostname_pattern(self):
        import re
        from log2seq_spark.rules.synthesis import field_fragment
        rx = re.compile("^(" + field_fragment(hostname("h")) + ")$")
        for ok in ["localhost", "hostname1", "host-name.example.net",
                   "192.0.2.1", "2001:db8::1", "::1"]:
            assert rx.match(ok), ok


# -- end-to-end (reference tests/test_parser.py) -----------------------------

class TestEndToEnd:
    def test_readme_line(self):
        eng = LineEngine(default_program(), default_year=2020)
        d = eng.parse_line("Jan  1 12:34:56 host-device1 system[12345]: "
                           "host 2001:0db8:1234::1 (interface:eth0) disconnected")
        ts = d["timestamp"]
        assert (ts.month, ts.day) == (1, 1)
        assert ts.time() == datetime.time(12, 34, 56)
        assert d["host"] == "host-device1"
        assert d["message"] == ("system[12345]: host 2001:0db8:1234::1 "
                                "(interface:eth0) disconnected")
        assert d["words"] == ["system", "12345", "host", "2001:0db8:1234::1",
                              "interface", "eth0", "disconnected"]
        assert d["symbols"] == ["", "[", "]: ", " ", " (", ":", ") ", ""]

    def test_apache_errorlog(self):
        eng = LineEngine(apache_errorlog_program())
        d = eng.parse_line(
            "[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] "
            "client denied by server configuration: /export/home/live/ap/htdocs/test")
        assert d["severityname"] == "error"
        assert d["host"] == "127.0.0.1"
        assert d["message"] == ("client denied by server configuration: "
                                "/export/home/live/ap/htdocs/test")

        d = eng.parse_line(
            "[Fri Sep 09 10:42:29.902022 2011] [core:error] "
            "[pid 35708:tid 4328636416] [client 72.15.99.187] "
            "File does not exist: /usr/local/apache2/htdocs/favicon.ico")
        assert d["modulename"] == "core"
        assert d["severityname"] == "error"
        assert d["processid"] == 35708
        assert d["threadid"] == 4328636416
        assert d["host"] == "72.15.99.187"
        assert d["message"] == "File does not exist: /usr/local/apache2/htdocs/favicon.ico"

        d = eng.parse_line(
            "[Mon Dec 05 08:10:12.123456 2016] [mpm_event:notice] "
            "[pid 1:tid 2] AH00489: Apache configured")
        assert d["modulename"] == "mpm_event"
        assert d["severityname"] == "notice"
        assert d["message"] == "AH00489: Apache configured"

        d = eng.parse_line(
            "[Mon Dec 05 08:10:12.123456 2016] [authz_core:error] "
            "[pid 1:tid 2] [client 1.2.3.4] AH01630: client denied")
        assert d["modulename"] == "authz_core"
        assert d["host"] == "1.2.3.4"
        assert d["message"] == "AH01630: client denied"

    def test_empty_and_failure_policy(self):
        eng = LineEngine(default_program(), default_year=2020)
        assert eng.parse_line("") is None
        assert eng.parse_line("\r\n") is None
        with pytest.raises(ParseFailure):
            eng.parse_line("GARBAGE no header at all !!")
        eng_ok = LineEngine(default_program(ignore_failure=True), default_year=2020)
        assert eng_ok.parse_line("GARBAGE no header at all !!") is None
