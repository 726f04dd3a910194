"""imkafka: Kafka records -> raw syslog messages (plugins/imkafka.c).

The reference consumes a topic and submits each record's VALUE as a raw
message, with the broker metadata available as properties. Spark shape:

    readStream.format("kafka") -> kafka_records_to_messages() -> the
    normal front door (uncompress -> sanitize -> PRI -> chain)

``kafka_records_to_messages`` is a pure column transform over the
standard Kafka source schema (key/value binary, topic, partition,
offset, timestamp) — fully unit-testable without a broker, and shared
verbatim between batch (`spark.read.format("kafka")`) and streaming.
The sandbox has no broker, so `read_kafka_stream` is exercised only to
the reader-construction point in tests (imkafka's consumer loop has no
table analog; its OFFSET tracking maps to the source's checkpointed
offsets exactly like imfile's state files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_records_to_messages(
    records: DataFrame,
    uncompress: bool = False,
    max_len: int = 8192,
) -> DataFrame:
    """Standard Kafka record frame -> (text, ts, conv_id, turn_idx,
    role, tool) transcript-shaped messages.

    - value bytes become the raw message text (imkafka submits the
      record payload verbatim); ``uncompress=True`` routes through the
      zlib front door first (tcpflood -C wire format over Kafka)
    - broker coordinates become the stable ordering key: conv_id =
      topic/partition (the reference's per-partition ordering unit),
      turn_idx = offset — gap-free per partition, exactly the
      (conv_id, turn_idx) contract the rest of the engine assumes
    - record timestamp = reception time (timegenerated analog)
    """
    base = records.select(
        F.concat_ws("/", "topic", F.col("partition").cast("string"))
        .alias("conv_id"),
        # Kafka offsets routinely exceed 2^31 on production topics; an
        # int cast would throw CAST_OVERFLOW under ANSI mode.  turn_idx
        # stays long here — downstream only ever orders/compares it, so
        # the wider type is a safe superset of the transcript contract.
        F.col("offset").cast("long").alias("turn_idx"),
        F.lit("system").alias("role"),
        F.col("value").alias("_raw"),
        F.lit("").alias("tool"),
        F.col("timestamp").alias("ts"),
    )
    if uncompress:
        from rsyslog_spark.parse.uncompress import with_uncompressed

        return with_uncompressed(
            base, raw_col="_raw", out_col="text", max_len=max_len
        ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    return base.select(
        "conv_id", "turn_idx", "role",
        F.col("_raw").cast("string").alias("text"), "tool", "ts",
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    uncompress: bool = False,
):
    """readStream.format('kafka') -> message frame (needs the Kafka
    connector package + a broker at start; construction documented for
    cluster use)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_records_to_messages(raw, uncompress=uncompress)
