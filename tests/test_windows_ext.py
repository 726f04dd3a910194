"""multiline assembly (imfile readMode/startmsg.regex), system time
properties, streaming windowed dynstats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.windows import multiline_assemble


@pytest.fixture(scope="module")
def lines(spark):
    rows = [
        ("f1", 0, "<13>start one"),
        ("f1", 1, "  continuation a"),
        ("f1", 2, "\tcontinuation b"),
        ("f1", 3, "<14>start two"),
        ("f2", 0, "orphan before any start"),
        ("f2", 1, "<15>msg"),
        ("f2", 2, "tail"),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


class TestMultiline:
    def test_startmsg_regex(self, lines):
        out = {
            (r["conv_id"], r["msg_seq"]): (r["first_turn_idx"],
                                           r["n_lines"], r["msg_text"])
            for r in multiline_assemble(lines, start_re="^<").collect()
        }
        assert out[("f1", 1)] == (
            0, 3, "<13>start one\n  continuation a\n\tcontinuation b"
        )
        assert out[("f1", 2)] == (3, 1, "<14>start two")
        assert out[("f2", 0)] == (0, 1, "orphan before any start")
        assert out[("f2", 1)] == (1, 2, "<15>msg\ntail")

    def test_indented_mode(self, lines):
        out = {
            (r["conv_id"], r["msg_seq"]): r["n_lines"]
            for r in multiline_assemble(lines, mode="indented").collect()
        }
        # readMode=1: leading space/tab = continuation
        assert out[("f1", 1)] == 3 and out[("f1", 2)] == 1

    def test_paragraph_mode(self, spark):
        rows = [("f", 0, "a"), ("f", 1, "b"), ("f", 2, ""),
                ("f", 3, "c"), ("f", 4, "d")]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = {r["msg_seq"]: r["msg_text"] for r in
               multiline_assemble(df, mode="paragraph").collect()}
        # readMode=2: empty line ends the paragraph
        assert out[1] == "a\nb\n" and out[2] == "c\nd"


class TestImmarkAndRatelimit:
    def test_mark_rows_span(self, spark):
        from rsyslog_spark.sources.mark import mark_rows

        df = spark.createDataFrame(
            [("2024-01-01 00:05:00",), ("2024-01-01 00:47:00",)], "s string"
        ).select(F.col("s").cast("timestamp").alias("ts"))
        marks = sorted(
            r["ts"].isoformat() for r in mark_rows(df, period_s=1200).collect()
        )
        # boundaries inside (00:05, 00:47]: 00:20, 00:40
        assert marks == ["2024-01-01T00:20:00", "2024-01-01T00:40:00"]

    def test_severity_bypass_consumes_no_budget(self, spark):
        from rsyslog_spark.windows import rate_limit

        rows = [("c", i, 7 if i % 2 == 0 else 0, "2024-01-01 00:00:05")
                for i in range(8)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, syslogseverity int, s string"
        ).select("*", F.col("s").cast("timestamp").alias("ts"))
        out = {r["turn_idx"]: r["rl_keep"]
               for r in rate_limit(df, 60, burst=2, severity=4).collect()}
        # sev 0 rows (odd idx) always pass; sev 7 rows (even) ranked
        # among THEMSELVES: first two pass, rest dropped
        assert out[1] and out[3] and out[5] and out[7]
        assert out[0] and out[2] and not out[4] and not out[6]

    def test_bsd_blocks_rejected(self, spark):
        from rsyslog_spark.config import parse_config

        with pytest.raises(ValueError, match="BSD-style blocks"):
            parse_config("!ppp\n*.err /var/log/x.log\n")


class TestSysTimeProps:
    def test_now_family(self, spark):
        from rsyslog_spark.templates import compile_template

        df = spark.createDataFrame(
            [(1,)], "i int"
        ).withColumn(
            "timegenerated",
            F.lit("2024-01-05 10:47:09").cast("timestamp"),
        )
        line = df.select(
            compile_template(
                "%$now%|%$year%|%$month%|%$day%|%$hour%|%$minute%|"
                "%$hhour%|%$qhour%|%$wday%|%$now-unixtimestamp%"
            ).alias("x")
        ).first()["x"]
        # 2024-01-05 is a Friday (wday 5); 47 min -> hhour 01, qhour 03
        assert line == "2024-01-05|2024|01|05|10|47|01|03|5|1704451629"


class TestStreamingDynInc:
    def test_windowed_counts(self, spark, tmp_path):
        from rsyslog_spark.streaming.stateful import streaming_dyn_inc

        src = tmp_path / "in"
        seed = spark.createDataFrame(
            [("a", "2024-01-01 00:01:00"), ("a", "2024-01-01 00:02:00"),
             ("b", "2024-01-01 00:03:00"), ("a", "2024-01-01 00:12:00")],
            "k string, s string",
        ).select("k", F.col("s").cast("timestamp").alias("ts"))
        seed.write.parquet(str(src))
        stream = spark.readStream.schema("k string, ts timestamp").parquet(
            str(src)
        )
        out = streaming_dyn_inc(stream, "x", "k", interval_s=600)
        q = (
            out.writeStream.format("memory")
            .queryName("dyninc_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {
            (r["key"], r["window_start"].isoformat()): r["count"]
            for r in spark.sql("SELECT * FROM dyninc_out").collect()
        }
        assert rows[("a", "2024-01-01T00:00:00")] == 2
        assert rows[("b", "2024-01-01T00:00:00")] == 1
        assert rows[("a", "2024-01-01T00:10:00")] == 1


class TestFailover:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 2), (2, 5), (3, 1), (4, 6)], "i int, syslogseverity int"
        )

    def test_suspended_primary_routes_to_failover(self, spark):
        from rsyslog_spark.config import compile_config

        conf = """
        ruleset(name="fo") {
            action(type="omfile" file="/x/pri.log")
            action(type="omfile" file="/x/alt.log"
                   action.execOnlyWhenPreviousIsSuspended="on")
        }
        """
        df = self._df(spark)
        ann, actions = compile_config(df, conf, entry="fo",
                                      suspended_sinks={"pri"})
        got = {a.sink: ann.filter(F.col(a.pred_col)).count()
               for a in actions}
        assert got == {"pri": 0, "alt": 4}
        # healthy primary: failover stays dark
        ann2, actions2 = compile_config(df, conf, entry="fo")
        got2 = {a.sink: ann2.filter(F.col(a.pred_col)).count()
                for a in actions2}
        assert got2 == {"pri": 4, "alt": 0}

    def test_failover_chain_two_deep(self, spark):
        from rsyslog_spark.config import compile_config

        conf = """
        ruleset(name="fo") {
            action(type="omfile" file="/x/a.log")
            action(type="omfile" file="/x/b.log"
                   action.execOnlyWhenPreviousIsSuspended="on")
            action(type="omfile" file="/x/c.log"
                   action.execOnlyWhenPreviousIsSuspended="on")
        }
        """
        df = self._df(spark)
        # a and b both down -> c fires (chain composes)
        ann, actions = compile_config(df, conf, entry="fo",
                                      suspended_sinks={"a", "b"})
        got = {x.sink: ann.filter(F.col(x.pred_col)).count()
               for x in actions}
        assert got == {"a": 0, "b": 0, "c": 4}
        # only a down -> b fires, c does not (b delivered, state clears)
        ann2, actions2 = compile_config(df, conf, entry="fo",
                                        suspended_sinks={"a"})
        got2 = {x.sink: ann2.filter(F.col(x.pred_col)).count()
                for x in actions2}
        assert got2 == {"a": 0, "b": 4, "c": 0}

    def test_previous_action_suspended_function(self, spark):
        from rsyslog_spark.config import compile_config

        conf = """
        ruleset(name="fo") {
            action(type="omfile" file="/x/pri.log")
            set $.pas = previous_action_suspended();
            action(type="omfile" file="/x/other.log")
            set $.pas2 = previous_action_suspended();
        }
        """
        df = self._df(spark)
        ann, _ = compile_config(df, conf, entry="fo",
                                suspended_sinks={"pri"})
        r = ann.select("vars").first()["vars"]
        assert r[".pas"] == "1"   # pri is down
        assert r[".pas2"] == "0"  # other delivered fine


class TestBreDialect:
    def test_translation_table(self):
        from rsyslog_spark.filters import bre_to_java

        assert bre_to_java(r"\(ab\|cd\)") == "(ab|cd)"
        assert bre_to_java(r"[0-9]\{2,3\}") == "[0-9]{2,3}"
        assert bre_to_java("(literal) a+b?c|d") == \
            r"\(literal\) a\+b\?c\|d"
        assert bre_to_java(r"a\+b\?") == "a+b?"
        assert bre_to_java(r"\.\*") == r"\.\*"  # escapes pass through
        assert bre_to_java("^x.*$") == "^x.*$"

    def test_backreference_rejected(self):
        import pytest as _pytest

        from rsyslog_spark.filters import bre_to_java

        with _pytest.raises(ValueError, match="back-reference"):
            bre_to_java(r"\(a\)\1")

    def test_predicate_bre_vs_ere(self, spark):
        from rsyslog_spark.filters import propfilt_predicate

        df = spark.createDataFrame(
            [(1, "pick (this) one"), (2, "pick this one")],
            "i int, msg string",
        )
        # BRE: bare parens are literals
        got = {r["i"] for r in df.filter(
            propfilt_predicate(F.col("msg"), "regex", "(this)")
        ).collect()}
        assert got == {1}
        # ERE: bare parens group
        got = {r["i"] for r in df.filter(
            propfilt_predicate(F.col("msg"), "ereregex", "(this)")
        ).collect()}
        assert got == {1, 2}


class TestFraming:
    def test_octet_counted_round_trip(self, spark):
        from rsyslog_spark.parse.framing import (
            frame_octet_counted,
            split_octet_counted,
        )

        msgs = ["<13>hello", "snowman ☃ bytes", "", "1 2 3"]
        df = spark.createDataFrame(
            [(i, m) for i, m in enumerate(msgs)], "i int, text string"
        )
        buf = df.select(
            F.lit("s").alias("conv_id"),
            "i",
            frame_octet_counted(F.col("text")).alias("fr"),
        ).groupBy("conv_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "fr"))),
                    lambda x: x["fr"],
                ), "",
            ).alias("buf")
        )
        out = split_octet_counted(buf).orderBy("frame_idx").collect()
        assert [r["text"] for r in out] == msgs
        assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]

    def test_octet_counted_malformed_stops(self, spark):
        from rsyslog_spark.parse.framing import split_octet_counted

        df = spark.createDataFrame(
            [("c", "5 hello6 world!JUNK7 ignored")], "conv_id string, buf string"
        )
        out = split_octet_counted(df).orderBy("frame_idx").collect()
        # 5:'hello', 6:'world!' then 'JUNK…' is not a digit header:
        # rest of the buffer dropped like a framing-error connection
        assert [r["text"] for r in out] == ["hello", "world!"]

    def test_octet_stuffed(self, spark):
        from rsyslog_spark.parse.framing import split_octet_stuffed

        df = spark.createDataFrame(
            [("c", "one\ntwo\nthree\n")], "conv_id string, buf string"
        )
        out = split_octet_stuffed(df).orderBy("frame_idx").collect()
        assert [r["text"] for r in out] == ["one", "two", "three"]

    def test_composes_with_zlib_front_door(self, spark):
        import zlib

        from rsyslog_spark.parse.framing import split_octet_counted
        from rsyslog_spark.parse.uncompress import with_uncompressed

        payload = b"z" + zlib.compress(b"<14>compressed msg")
        # binary-safe framing: length counts the raw bytes
        frame = str(len(payload)).encode() + b" " + payload + b"7 <13>raw"
        df = spark.createDataFrame([("c", frame)], "conv_id string, buf binary")
        frames = split_octet_counted(df, binary=True, out_col="raw")
        # frames whose payload starts with 'z' go through uncompress
        restored = with_uncompressed(
            frames.select("conv_id", "frame_idx", "raw"),
            raw_col="raw", out_col="text",
        )
        got = {r["frame_idx"]: r["text"] for r in restored.collect()}
        assert got[1] == "<13>raw"
        assert got[0] == "<14>compressed msg"

    def test_legacy_config_line_bre(self, spark):
        # the documented rsyslog legacy form ':msg, regex, "..."' is a
        # POSIX BRE pattern (regcomp without REG_EXTENDED): escaped
        # parens/pipe are operators, bare ones literals
        from rsyslog_spark.config import compile_config

        df = spark.createDataFrame(
            [(1, "fatal error on disk"), (2, "fatal failure"),
             (3, "fatal (error) literal"), (4, "all fine")],
            "i int, msg string",
        )
        conf = r''':msg, regex, "fatal \(error\|failure\)" /var/log/bad.log'''
        ann, actions = compile_config(df, conf)
        assert actions[0].sink == "bad"
        got = {r["i"] for r in ann.filter(F.col(actions[0].pred_col))
               .select("i").collect()}
        assert got == {1, 2}

    def test_errorfile_json_capture(self, spark):
        # actionWriteErrorFile (action.c:1410-1466): a suspended
        # action's attempted rows land in its errorfile as JSON lines
        # {"action", "status" (RS_RET_SUSPENDED -2007), "template0"}
        import json

        from rsyslog_spark.config import compile_config

        df = spark.createDataFrame(
            [(1, "hello"), (2, "world")], "i int, msg string"
        )
        conf = """
        ruleset(name="fo") {
            action(type="omfile" file="/x/pri.log"
                   action.errorfile="/x/err.log")
        }
        """
        ann, actions = compile_config(df, conf, entry="fo",
                                      suspended_sinks={"pri"})
        by_sink = {a.sink: a for a in actions}
        assert ann.filter(F.col(by_sink["pri"].pred_col)).count() == 0
        err = by_sink["err"]
        rows = [json.loads(r[err.out_col])
                for r in err.output(ann).select(err.out_col).collect()]
        assert len(rows) == 2
        assert all(r["action"] == "pri" and r["status"] == -2007
                   for r in rows)
        assert {r["template0"] for r in rows} == {"hello", "world"}
        # healthy action: no errorfile action is emitted at all
        _, actions2 = compile_config(df, conf, entry="fo")
        assert all(a.sink != "err" for a in actions2)


class TestDynIncMulti:
    @pytest.fixture(scope="class")
    def frame(self, spark):
        rows = [(i, f"p{i % 3}", f"h{i % 9}") for i in range(90)]
        return spark.createDataFrame(rows, "i long, prog string, host string")

    def test_matches_per_bucket_union(self, frame):
        from rsyslog_spark import agg as A

        multi = A.dyn_inc_multi(
            frame, [("progs", "prog", 0), ("hosts", "host", 4)]
        )
        single = A.dyn_inc(frame, "progs", "prog").unionByName(
            A.dyn_inc(frame, "hosts", "host", max_cardinality=4)
        )
        assert multi.exceptAll(single).count() == 0
        assert single.exceptAll(multi).count() == 0

    def test_overflow_row(self, frame):
        from rsyslog_spark import agg as A

        out = {
            (r["name"], r["key"]): r["count"]
            for r in A.dyn_inc_multi(
                frame, [("hosts", "host", 4)]
            ).collect()
        }
        # 9 hosts x 10 each: top 4 kept, 5 x 10 overflowed
        assert out[("hosts", "ops_overflow")] == 50
        assert len(out) == 5
