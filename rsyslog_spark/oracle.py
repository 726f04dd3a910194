"""DuckDB oracle SQL builders for the driver's correctness gate.

The driver runs each ``__spark_entry__.queries()[name]`` on Spark AND the
matching ``oracle_sql()[name]`` on DuckDB (views ``events``, ``documents``,
``embeddings`` … pre-registered) and compares row count + schema + an
order-insensitive value hash.

The oracle mirrors the reference's golden-sequence test philosophy
(tests/diag.sh:460-464 ``seq_check``): the transcript generator embeds the
row sequence ``i`` into every message, so the EXPECTED parse output is
derivable in closed form from ``i`` — an oracle fully independent of the
Spark parse path (which walks the actual text through sanitize → PRI →
pmrfc5424 → pmrfc3164, tools/pmrfc3164.c / tools/pmrfc5424.c semantics).

Everything here is plain ANSI-ish SQL in the DuckDB dialect.
"""

from __future__ import annotations

from rsyslog_spark.sources.transcripts import _ALPHA, transcripts_sql_duckdb

# ---------------------------------------------------------------------------
# transcript CTE over the pre-registered `events` view
# ---------------------------------------------------------------------------


def transcripts_cte(relation: str = "events") -> str:
    """Transcript SELECT (DuckDB) reading from a registered view."""
    return transcripts_sql_duckdb(None, relation=relation)


# closed-form parse oracle: one column per engine output, derived from i.
# class c = i % 10: 0-4 RFC3164, 5-7 RFC5424, 8 headerless JSON, 9 garbage.
_FRAG = {
    "app": (
        "CASE i % 4 WHEN 0 THEN 'tool-runner' WHEN 1 THEN 'chat' "
        "WHEN 2 THEN 'kernelish' ELSE 'sshd-like' END"
    ),
    "sevname": (
        "CASE i % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit' "
        "WHEN 3 THEN 'err' WHEN 4 THEN 'warning' WHEN 5 THEN 'notice' "
        "WHEN 6 THEN 'info' ELSE 'debug' END"
    ),
    "pid": "CAST(1000 + i % 50 AS VARCHAR)",
    "host": "concat('host', lpad(CAST(i % 16 AS VARCHAR), 3, '0'))",
    "msgnum": "lpad(CAST(i AS VARCHAR), 8, '0')",
    "payload": f"substr('{_ALPHA}', 1 + CAST(i % 40 AS INT), 20 + CAST(i % 60 AS INT))",
}


def parsed_cte() -> str:
    """SELECT over t0 producing the engine's parse output in closed form.

    Matches rsyslog_spark.parse.with_parsed(require_header=True) — i.e.
    the default [pmrfc5424, pmrfc3164] chain (runtime/parser.c:646-648)
    with parse failures kept as parse_success=false rows.
    """
    f = _FRAG
    c = "(i % 10)"
    tag3164 = f"concat({f['app']}, '[', {f['pid']}, ']:')"
    tag5424 = f"concat({f['app']}, '[', {f['pid']}, ']')"
    msg3164 = f"concat(' msgnum:', {f['msgnum']}, ' ', {f['payload']})"
    msg5424 = f"concat('msgnum:', {f['msgnum']}, ' ', {f['payload']})"
    msg_garbage = (
        f"concat('garbage msgnum:', {f['msgnum']}, ' ', {f['payload']}, '#007')"
    )
    ts_parsed = (
        "TIMESTAMP '2024-01-05 10:00:00' + INTERVAL (i % 60) MINUTE "
        "+ INTERVAL ((i * 7) % 60) SECOND"
    )
    return f"""
    SELECT
      conv_id, turn_idx, role, tool, ts, i, text,
      CASE WHEN {c} <= 7 THEN CAST((i % 24) * 8 + (i % 8) AS INT)
           ELSE 13 END AS pri,
      CASE WHEN {c} <= 7 THEN CAST(i % 24 AS INT) ELSE 1 END AS syslogfacility,
      CASE WHEN {c} <= 7 THEN CAST(i % 8 AS INT) ELSE 5 END AS syslogseverity,
      CASE WHEN {c} <= 7 THEN {f['host']} ELSE '' END AS hostname,
      CASE WHEN {c} <= 4 THEN {tag3164}
           WHEN {c} <= 7 THEN {tag5424}
           WHEN {c} = 8 THEN ''
           ELSE NULL END AS syslogtag,
      CASE WHEN {c} <= 7 THEN {f['app']}
           WHEN {c} = 8 THEN ''
           ELSE NULL END AS programname,
      CASE WHEN {c} BETWEEN 5 AND 7 THEN {f['app']} ELSE NULL END AS app_name,
      CASE WHEN {c} <= 7 THEN {f['pid']}
           WHEN {c} = 8 THEN ''
           ELSE NULL END AS procid,
      CASE WHEN {c} BETWEEN 5 AND 7
           THEN concat('ID', CAST(i % 100 AS VARCHAR)) ELSE NULL END AS msgid,
      CASE WHEN {c} BETWEEN 5 AND 7
           THEN '[exampleSDID@32473 k="v"]' ELSE NULL END AS structured_data,
      CASE WHEN {c} <= 4 THEN {msg3164}
           WHEN {c} <= 7 THEN {msg5424}
           WHEN {c} = 8 THEN text
           ELSE {msg_garbage} END AS msg,
      CASE WHEN {c} <= 4 THEN 'rfc3164'
           WHEN {c} <= 7 THEN 'rfc5424'
           WHEN {c} = 8 THEN 'rfc3164'
           ELSE 'none' END AS parser,
      ({c} <> 9) AS parse_success,
      CAST(CASE WHEN {c} BETWEEN 5 AND 7 THEN 1 ELSE 0 END AS INT)
        AS protocol_version,
      CASE WHEN {c} <= 7 THEN {ts_parsed} ELSE ts END AS timereported,
      CASE WHEN {c} = 9 THEN {msg_garbage}
           WHEN {c} <= 7 THEN text ELSE text END AS rawmsg
    FROM t0
    """


def with_parsed_oracle(body: str, relation: str = "events") -> str:
    """Wrap a SELECT ``body`` referencing CTE ``p`` (parsed transcripts)."""
    return (
        f"WITH t0 AS ({transcripts_cte(relation)}),\n"
        f"p AS ({parsed_cte()})\n{body}"
    )


# date renderers matching rsyslog_spark.templates.format_timestamp
TS3164 = (
    "strftime({col}, '%b') || ' ' || lpad(CAST(day({col}) AS VARCHAR), 2, ' ')"
    " || ' ' || strftime({col}, '%H:%M:%S')"
)
TS3339 = "strftime({col}, '%Y-%m-%dT%H:%M:%S+00:00')"


def ts3164(col: str) -> str:
    return TS3164.format(col=col)


def ts3339(col: str) -> str:
    return TS3339.format(col=col)
