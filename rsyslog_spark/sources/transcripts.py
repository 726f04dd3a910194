"""Deterministic transcript-table derivation, dual-dialect (Spark + DuckDB).

BASELINE.json mandates the input shape ``(conv_id string, turn_idx int32,
role string, text string, tool string, ts timestamp)`` but the sandbox
test data has no transcripts table, so we derive one DETERMINISTICALLY
from the driver-provided ``events`` parquet (contiguous ``event_id``).
The derivation is a single SQL expression kept dialect-portable so the
DuckDB oracle computes byte-identical rows — this is what lets the driver
verify per-turn text equality end to end.

Text formats per FIXTURES.md (i % 10): RFC3164 (0-4), RFC5424 (5-7),
headerless JSON (8, leading '{' so the reference headerless branch
pmrfc3164.c:195-205 applies), malformed/no-header (9, contains a BEL
control char to exercise sanitize parser.c:489-535 and — under the
flagship chain's require_header — the discard path parser.c:679-687).

1%-ish of conversations are "hot" (10% of all rows land in 3 conv_ids)
to exercise skew handling at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ALPHA = (
    "the quick brown fox jumps over the lazy dog while the tool runner "
    "parses enriches routes and aggregates transcript turns at scale "
)

# dialect-specific fragments
_TS_ADD = {
    "spark": "timestampadd(SECOND, i, TIMESTAMP '2024-01-01 00:00:00')",
    "duckdb": "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) SECOND",
}


def _body(dialect: str) -> str:
    """The shared SELECT body over a relation t(i)."""
    sevname = (
        "CASE i % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit' "
        "WHEN 3 THEN 'err' WHEN 4 THEN 'warning' WHEN 5 THEN 'notice' "
        "WHEN 6 THEN 'info' ELSE 'debug' END"
    )
    app = (
        "CASE i % 4 WHEN 0 THEN 'tool-runner' WHEN 1 THEN 'chat' "
        "WHEN 2 THEN 'kernelish' ELSE 'sshd-like' END"
    )
    pri = "CAST((i % 24) * 8 + (i % 8) AS INT)"
    mm = "lpad(CAST(i % 60 AS STRING), 2, '0')"
    ss = "lpad(CAST((i * 7) % 60 AS STRING), 2, '0')"
    host = "concat('host', lpad(CAST(i % 16 AS STRING), 3, '0'))"
    pid = "CAST(1000 + i % 50 AS STRING)"
    msgnum = "lpad(CAST(i AS STRING), 8, '0')"
    payload = f"substr('{_ALPHA}', 1 + CAST(i % 40 AS INT), 20 + CAST(i % 60 AS INT))"
    if dialect == "duckdb":
        # DuckDB has no STRING alias
        for frag in ("mm", "ss", "host", "pid", "msgnum"):
            pass
        mm = mm.replace("AS STRING", "AS VARCHAR")
        ss = ss.replace("AS STRING", "AS VARCHAR")
        host = host.replace("AS STRING", "AS VARCHAR")
        pid = pid.replace("AS STRING", "AS VARCHAR")
        msgnum = msgnum.replace("AS STRING", "AS VARCHAR")

    text = f"""
    CASE
      WHEN i % 10 <= 4 THEN concat(
        '<', CAST({pri} AS VARCHAR), '>Jan  5 10:', {mm}, ':', {ss}, ' ',
        {host}, ' ', {app}, '[', {pid}, ']: msgnum:', {msgnum}, ' ', {payload})
      WHEN i % 10 <= 7 THEN concat(
        '<', CAST({pri} AS VARCHAR), '>1 2024-01-05T10:', {mm}, ':', {ss},
        '.000Z ', {host}, ' ', {app}, ' ', {pid}, ' ID', CAST(i % 100 AS VARCHAR),
        ' [exampleSDID@32473 k="v"] msgnum:', {msgnum}, ' ', {payload})
      WHEN i % 10 = 8 THEN concat(
        '{{"msgnum":', CAST(i AS VARCHAR), ',"lvl":"', {sevname}, '"}}')
      ELSE concat('garbage msgnum:', {msgnum}, ' ', {payload}, chr(7))
    END
    """
    if dialect == "spark":
        text = text.replace("AS VARCHAR", "AS STRING")

    conv = "CASE WHEN i % 100 < 10 THEN i % 3 ELSE 3 + (i % 997) END"
    role = (
        "CASE WHEN i % 20 < 8 THEN 'user' WHEN i % 20 < 16 THEN 'assistant' "
        "WHEN i % 20 < 19 THEN 'tool' ELSE 'system' END"
    )
    tool = (
        "CASE WHEN i % 20 >= 16 AND i % 20 < 19 THEN "
        "(CASE i % 4 WHEN 0 THEN 'bash' WHEN 1 THEN 'search' "
        "WHEN 2 THEN 'editor' ELSE 'browser' END) ELSE '' END"
    )
    strv = "VARCHAR" if dialect == "duckdb" else "STRING"
    return f"""
      SELECT
        concat('conv', lpad(CAST(({conv}) AS {strv}), 8, '0')) AS conv_id,
        CAST(row_number() OVER (
          PARTITION BY ({conv}) ORDER BY i) - 1 AS INTEGER) AS turn_idx,
        {role} AS role,
        {text} AS text,
        {tool} AS tool,
        {_TS_ADD[dialect]} AS ts,
        i
    """


def transcripts_sql_duckdb(
    sf_dir: str | None, replicas: int = 1, relation: str | None = None
) -> str:
    """DuckDB SELECT producing the transcript table for an sf dir.

    ``relation`` overrides the events source with a registered view name
    (the driver pre-registers ``events`` — used by the oracle SQL).
    """
    src = relation or f"'{sf_dir}/events.parquet'"
    if replicas == 1:
        rel = f"(SELECT event_id AS i FROM {src})"
    else:
        rel = (
            f"(SELECT event_id * {replicas} + r.range AS i "
            f"FROM {src} CROSS JOIN range({replicas}) r)"
        )
    return _body("duckdb") + f" FROM {rel} t"


def transcripts_spark(
    spark: SparkSession, sf_dir: str, replicas: int = 1
) -> DataFrame:
    """Spark DataFrame of the transcript table for an sf dir.

    At 10^12-turn scale this is where the real Iceberg scan happens; the
    derived table stands in for it with identical shape and skew profile.
    """
    # the driver testdata is a single parquet file -> a single input
    # partition; spread the seed rows across the cluster BEFORE the
    # (explode, window, text-construction) work or everything downstream
    # of the scan runs in one task. At real scale the Iceberg table has
    # thousands of files and this shuffle of the tiny seed is free.
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    ev.createOrReplaceTempView("_ts_events")
    if replicas == 1:
        rel = "(SELECT event_id AS i FROM _ts_events)"
    else:
        rel = (
            f"(SELECT event_id * {replicas} + r AS i FROM _ts_events "
            f"LATERAL VIEW explode(sequence(0, {replicas - 1})) AS r)"
        )
    return spark.sql(_body("spark") + f" FROM {rel} t")
