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


def imkafka_options(inst: dict) -> dict:
    """imkafka input() instance params -> Spark Kafka source options.

    Mirrors imkafka.c's instance block (imkafka.c:144-151): ``topic``
    (required), ``broker`` (array; default "localhost:9092",
    imkafka.c:589), ``consumergroup`` -> kafka.group.id, and
    ``confparam`` entries ("key=value" librdkafka settings) passed
    through with the ``kafka.`` prefix Spark requires. ``ruleset``
    binds downstream (the caller routes the message frame), and
    ``parsehostname`` is chain behavior, not a reader option — both
    are returned untouched under ``_pipeline`` so nothing is silently
    dropped. Unknown keys are loud errors like the reference's param
    block."""
    known = {"topic", "broker", "confparam", "consumergroup",
             "ruleset", "parsehostname"}
    unknown = set(inst) - known
    if unknown:
        raise ValueError(
            f"imkafka: unknown input param(s) {sorted(unknown)} "
            "(imkafka.c:144-151)"
        )
    if "topic" not in inst:
        raise ValueError("imkafka: 'topic' is required (CNFPARAM_REQUIRED)")
    brokers = inst.get("broker", ["localhost:9092"])
    if isinstance(brokers, str):
        brokers = [brokers]
    opts = {
        "kafka.bootstrap.servers": ",".join(brokers),
        "subscribe": inst["topic"],
    }
    if inst.get("consumergroup"):
        opts["kafka.group.id"] = inst["consumergroup"]
    for cp in inst.get("confparam", []) or []:
        if "=" not in cp:
            raise ValueError(
                f"imkafka confparam needs key=value, got {cp!r}"
            )
        k, v = cp.split("=", 1)
        opts[f"kafka.{k.strip()}"] = v.strip()
    pipeline = {
        k: inst[k] for k in ("ruleset", "parsehostname") if k in inst
    }
    if pipeline:
        opts["_pipeline"] = pipeline
    return opts


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
