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
