"""Streaming pipeline tests: foreachBatch fan-out with checkpointed
exactly-once, and cross-batch stateful repeat suppression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.sources.transcripts import transcripts_spark
from rsyslog_spark.streaming import (
    read_transcript_stream,
    stream_flagship,
    streaming_repeat_suppression,
)


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """Transcript table written as TWO parquet files -> two micro-batches
    with maxFilesPerTrigger=1."""
    d = tmp_path_factory.mktemp("stream_src")
    t = transcripts_spark(spark, "/root/testdata/sf0.001")
    t.filter(F.col("i") < 500).coalesce(1).write.parquet(
        str(d), mode="append"
    )
    t.filter(F.col("i") >= 500).coalesce(1).write.parquet(
        str(d), mode="append"
    )
    return str(d)


class TestStreamFlagship:
    def test_fan_out_counts_and_resume(self, spark, stream_src, tmp_path):
        base = str(tmp_path / "sinks")
        ckpt = str(tmp_path / "ckpt")
        stream = read_transcript_stream(spark, stream_src,
                                        max_files_per_trigger=1)
        stream_flagship(stream, base, ckpt)
        m = spark.read.parquet(f"{base}/metrics")
        agg = {
            r["sink"]: r["total"]
            for r in m.groupBy("sink").agg(F.sum("n").alias("total")).collect()
        }
        assert agg["archive"] == 900
        assert agg["parse_errors"] == 100
        assert m.select("batch_id").distinct().count() >= 2  # micro-batches
        n_archive = spark.read.parquet(f"{base}/archive").count()
        assert n_archive == 900
        # restart with the same checkpoint: no new data -> no duplicates
        # (exactly-once per micro-batch, .qi-file analog)
        stream2 = read_transcript_stream(spark, stream_src,
                                         max_files_per_trigger=1)
        stream_flagship(stream2, base, ckpt)
        assert spark.read.parquet(f"{base}/archive").count() == 900


class TestStatefulRepeat:
    def test_runs_collapse_across_batches(self, spark, tmp_path):
        d = tmp_path / "src"
        rows1 = [("c1", 0, "A"), ("c1", 1, "A"), ("c1", 2, "B")]
        rows2 = [("c1", 3, "B"), ("c1", 4, "C"), ("c2", 0, "X")]
        schema = "conv_id string, turn_idx int, msg string"
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
            str(d), mode="append"
        )
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
            str(d), mode="append"
        )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        out = streaming_repeat_suppression(src, state_ttl_ms=2000)
        # a stateful query with processing-time timers is a CONTINUOUS
        # query (availableNow never drains the timer loop) — run it,
        # poll the sink for the expected rows, stop it.
        q = (
            out.writeStream.format("memory")
            .queryName("repeat_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        import time

        got = {}
        try:
            deadline = time.time() + 120
            while time.time() < deadline and len(got) < 4:
                time.sleep(2)
                got = {
                    (r["conv_id"], r["msg"]): r["repeat_count"]
                    for r in spark.sql("select * from repeat_out").collect()
                }
        finally:
            q.stop()
        # closed runs: A×2 (batch 1) and B×2 spanning both micro-batches
        # (closed by C); C and X flushed by the 2 s state TTL
        assert got[("c1", "A")] == 1
        assert got[("c1", "B")] == 1
        assert got[("c1", "C")] == 0
        assert got[("c2", "X")] == 0


class TestIdempotentReplay:
    def test_batch_replay_overwrites_not_duplicates(
        self, spark, stream_src, tmp_path
    ):
        """Crash-replay simulation (ADVICE r01): a re-run micro-batch
        must OVERWRITE its own batch_id partitions, not append — delete
        the checkpoint so the same files replay under the same batch
        ids against already-written sinks."""
        import shutil

        base = str(tmp_path / "sinks")
        ckpt = str(tmp_path / "ckpt")
        stream = read_transcript_stream(spark, stream_src,
                                        max_files_per_trigger=1)
        stream_flagship(stream, base, ckpt)
        first = spark.read.parquet(f"{base}/archive").count()
        # replay: fresh checkpoint, SAME sink dir -> same batch ids
        shutil.rmtree(ckpt)
        stream2 = read_transcript_stream(spark, stream_src,
                                         max_files_per_trigger=1)
        stream_flagship(stream2, base, str(tmp_path / "ckpt2"))
        assert spark.read.parquet(f"{base}/archive").count() == first
        m = spark.read.parquet(f"{base}/metrics")
        agg = {
            r["sink"]: r["total"]
            for r in m.groupBy("sink").agg(F.sum("n").alias("total")).collect()
        }
        assert agg["archive"] == first == 900


class TestWatermarkedDynInc:
    def test_late_data_across_batches(self, spark, tmp_path):
        """streaming_dyn_inc e2e over three micro-batches (VERDICT r02
        #8): a late row INSIDE the watermark still counts, a row older
        than the watermark is dropped (the emitted-counter-is-never-
        amended trade dynstats.c makes), and closed windows emit as the
        watermark passes their end."""
        from rsyslog_spark.streaming import streaming_dyn_inc

        d = tmp_path / "src"
        schema = "conv_id string, turn_idx int, role string, ts timestamp"

        def _write(rows):
            spark.createDataFrame(
                rows, "conv_id string, turn_idx int, role string, ts string"
            ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
                1
            ).write.parquet(str(d), mode="append")

        # batch 1: two rows in W0 [10:00,10:10), one in W1 [10:10,10:20),
        # plus an event-time advancer at 10:25 -> watermark after this
        # batch = 10:25 - 10min = 10:15 (W0 closed)
        _write([
            ("c", 0, "user", "2024-01-05 10:00:30"),
            ("c", 1, "user", "2024-01-05 10:05:00"),
            ("c", 2, "user", "2024-01-05 10:12:00"),
            ("c", 3, "user", "2024-01-05 10:25:00"),
        ])
        # batch 2: 10:17 is late (watermark 10:15) but its window W1 is
        # still open -> COUNTS; advancer to 10:40 pushes the watermark
        # to 10:30 (closing W1 and W2)
        _write([
            ("c", 4, "user", "2024-01-05 10:17:00"),
            ("c", 6, "user", "2024-01-05 10:40:00"),
        ])
        # batch 3: 10:02 is a straggler whose window W0 closed a batch
        # ago -> DROPPED (Spark filters late events with the PREVIOUS
        # batch's watermark, 10:30 here — one-batch lag by design, so a
        # same-batch closure still counts; verified via
        # numRowsDroppedByWatermark); advancer to 11:05 pushes the
        # final watermark to 10:55, past W3's end
        _write([
            ("c", 5, "user", "2024-01-05 10:02:00"),
            ("c", 7, "user", "2024-01-05 11:05:00"),
        ])

        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        out = streaming_dyn_inc(
            src, "roles", "role", ts_col="ts", interval_s=600,
            watermark="10 minutes",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("dyn_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            p.get("stateOperators", [{}])[0].get(
                "numRowsDroppedByWatermark", 0
            )
            for p in q.recentProgress
        )
        got = {
            str(r["window_start"]): r["count"]
            for r in spark.sql("select * from dyn_out").collect()
        }
        # the 10:02 straggler was dropped by the watermark filter
        assert dropped == 1
        # W0: 2 rows (straggler NOT amended into the emitted counter)
        assert got["2024-01-05 10:00:00"] == 2
        # W1: 10:12 (on time) + 10:17 (late but inside watermark)
        assert got["2024-01-05 10:10:00"] == 2
        # W2: the 10:25 advancer row
        assert got["2024-01-05 10:20:00"] == 1
        # W3 (10:40) emitted in the final no-data batch once the
        # watermark reached 10:55, past its 10:50 end (the 11:05
        # advancer's own window stays open — state stays bounded)
        assert got["2024-01-05 10:40:00"] == 1
