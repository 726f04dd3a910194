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
