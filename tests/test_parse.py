"""Golden tests for the parser chain, derived by hand from the C logic
(tools/pmrfc3164.c, tools/pmrfc5424.c, runtime/parser.c) — the reference
test style is golden end-to-end checks (tests/rscript_*.sh, seq_check)."""

from __future__ import annotations

import pandas as pd
import pytest

from rsyslog_spark.parse.chain import parse_chain_pd


RECV = pd.Timestamp("2024-06-15 12:00:00")


def run(text, fac=1, has_pri=True, require_header=False, recv=RECV):
    r = parse_chain_pd(
        pd.Series([text]),
        pd.Series([fac]),
        pd.Series([recv]),
        pd.Series(["rxhost"]),
        pd.Series([has_pri]),
        require_header=require_header,
    )
    return r.iloc[0].to_dict()


class TestRFC3164:
    def test_classic(self):
        r = run("Jan  5 10:01:02 host01 app[42]: hello")
        assert r["parser"] == "rfc3164"
        assert r["hostname"] == "host01"
        assert r["syslogtag"] == "app[42]:"
        assert r["msg"] == " hello"  # SP after ':' is MSG content
        assert r["timestamp_text"] == "Jan  5 10:01:02"
        assert r["timereported"] == pd.Timestamp("2024-01-05 10:01:02")

    def test_two_digit_day(self):
        r = run("Dec 25 23:59:59 h a: m")
        assert r["timereported"] == pd.Timestamp("2024-12-25 23:59:59")

    def test_tag_ends_at_space_keeps_space_in_msg(self):
        # "a SP is NOT part of the tag (it is CONTENT)" pmrfc3164.c:333
        r = run("Jan  5 10:00:00 host01 word rest")
        assert r["syslogtag"] == "word"
        assert r["msg"] == " rest"

    def test_no_hostname_when_tag_like(self):
        # 'app[42]:' stops walk at '[', last char alnum but next != ' '
        r = run("Jan  5 10:00:00 app[42]: m")
        assert r["hostname"] == "rxhost"  # falls back to fromhost
        assert r["syslogtag"] == "app[42]:"

    def test_hostname_trailing_dash_not_hostname(self):
        # last consumed char '-' is not alnum -> not a hostname
        r = run("Jan  5 10:00:00 abc-. rest")
        assert r["hostname"] == "rxhost"

    def test_hostname_consumes_entire_rest(self):
        r = run("Jan  5 10:00:00 onlyhost")
        assert r["hostname"] == "onlyhost"
        assert r["msg"] == ""

    def test_headerless_json(self):
        r = run('{"a":1}')
        assert r["msg"] == '{"a":1}'
        assert r["syslogtag"] == ""
        assert r["hostname"] == "rxhost"
        assert r["timereported"] == RECV

    def test_headerless_after_spaces(self):
        r = run('   [1,2]')
        assert r["msg"] == "   [1,2]"

    def test_invalid_facility_no_parse(self):
        # pmrfc3164.c:190-193: facility LOG_INVLD -> whole text is MSG
        r = run("<999 whatever", fac=24)
        assert r["msg"] == "<999 whatever"
        assert r["syslogtag"] == ""

    def test_no_timestamp_uses_recv(self):
        r = run("host01 app: m")
        assert r["timereported"] == RECV
        assert r["hostname"] == "host01"

    def test_hp_procurve_leading_space(self):
        r = run(" Jan  5 10:00:00 h a: m")
        assert r["timestamp_text"] == "Jan  5 10:00:00"
        assert r["hostname"] == "h"

    def test_rfc3339_in_legacy(self):
        r = run("2024-02-03T01:02:03+02:00 myhost app: x")
        assert r["timereported"] == pd.Timestamp("2024-02-02 23:02:03")
        assert r["hostname"] == "myhost"

    def test_year_rollover_dec_msg_jan_recv(self):
        r = run("Dec 31 23:00:00 h a: m", recv=pd.Timestamp("2025-01-01 00:05:00"))
        assert r["timereported"] == pd.Timestamp("2024-12-31 23:00:00")

    def test_year_rollover_jan_msg_dec_recv(self):
        r = run("Jan  1 00:00:05 h a: m", recv=pd.Timestamp("2024-12-31 23:59:00"))
        assert r["timereported"] == pd.Timestamp("2025-01-01 00:00:05")

    def test_require_header_rejects_garbage(self):
        r = run("garbage text", has_pri=False, require_header=True)
        assert r["parse_success"] is False or r["parse_success"] == False
        assert r["parser"] == "none"
        assert r["msg"] == "garbage text"

    def test_require_header_keeps_pri_rows(self):
        r = run("garbage text", has_pri=True, require_header=True)
        assert r["parse_success"]


class TestRFC5424:
    def test_full(self):
        r = run('1 2024-01-05T10:02:03.5Z h01 app 77 MID [x@1 a="b"] the msg')
        assert r["parser"] == "rfc5424"
        assert r["protocol_version"] == 1
        assert r["hostname"] == "h01"
        assert r["app_name"] == "app"
        assert r["procid"] == "77"
        assert r["msgid"] == "MID"
        assert r["structured_data"] == '[x@1 a="b"]'
        assert r["msg"] == "the msg"
        assert r["syslogtag"] == "app[77]"
        assert r["timereported"] == pd.Timestamp("2024-01-05 10:02:03.500")

    def test_nil_fields(self):
        r = run("1 - - - - - just msg")
        assert r["timestamp_text"] == "-"
        assert r["timereported"] == RECV
        assert r["syslogtag"] == "-"  # app '-', procid '-' -> bare app

    def test_nil_procid_tag(self):
        r = run("1 - host app - MID - m")
        assert r["syslogtag"] == "app"  # msg.c:2497-2500

    def test_sd_with_escaped_bracket(self):
        r = run(r'1 - h a p m [x@1 k="a\]b"] msg')
        assert r["structured_data"] == r'[x@1 k="a\]b"]'
        assert r["msg"] == "msg"

    def test_multiple_sd_elements(self):
        r = run('1 - h a p m [x@1 k="v"][y@2 j="w"] msg')
        assert r["structured_data"] == '[x@1 k="v"][y@2 j="w"]'

    def test_no_msg(self):
        r = run("1 - h a p m -")
        assert r["msg"] == ""
        assert r["structured_data"] == "-"

    def test_version_2_not_5424(self):
        r = run("2 2024-01-05T10:02:03Z h a p m - msg")
        assert r["parser"] == "rfc3164"

    def test_tz_offset_negative(self):
        r = run("1 2024-01-05T10:00:00-03:30 h a p m - x")
        assert r["timereported"] == pd.Timestamp("2024-01-05 13:30:00")


class TestSanitize:
    """sanitize is 100% native expressions now; exercise via Spark."""

    def _san(self, spark, vals):
        from rsyslog_spark.parse.sanitize import with_sanitized

        df = spark.createDataFrame([(v,) for v in vals], "text string")
        return [r["rawmsg"] for r in with_sanitized(df).collect()]

    def test_sanitize_semantics(self, spark):
        got = self._san(
            spark,
            ["ab\x07cd", "a\tb", "hello\n", "a\nb\n", "plain text"],
        )
        # octal '#NNN' escapes (parser.c:528-534); ONE trailing LF
        # dropped (parser.c:415-421), inner LF escaped; clean untouched
        assert got == ["ab#007cd", "a#011b", "hello", "a#012b", "plain text"]


class TestChain:
    def test_order_5424_first(self):
        r = run("1 - h a p m - x")
        assert r["parser"] == "rfc5424"

    def test_fallthrough(self):
        r = run("Jan  5 10:00:00 h a: m")
        assert r["parser"] == "rfc3164"

    def test_batch_mixed(self):
        texts = pd.Series(
            ["1 - h a p m - x", "Jan  5 10:00:00 h a: m", "junk", ""]
        )
        r = parse_chain_pd(
            texts,
            pd.Series([1, 1, 1, 1]),
            pd.Series([RECV] * 4),
            pd.Series([""] * 4),
            pd.Series([True, True, False, False]),
            require_header=True,
        )
        assert list(r["parser"]) == ["rfc5424", "rfc3164", "none", "none"]
        assert list(r["parse_success"]) == [True, True, False, False]
