"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse→enrich→route query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (closed-form golden
derivation, rsyslog_spark/oracle.py; philosophy of the reference's
seq_check golden tests, tests/diag.sh:460-464).

Column names and types are aligned pairwise: every computed column is
aliased identically on both sides; counters/row numbers are BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rsyslog_spark import agg as A
from rsyslog_spark import mods
from rsyslog_spark import windows as W
from rsyslog_spark.filters import prifilt_predicate, propfilt_predicate
from rsyslog_spark.coerce import rs_div
from rsyslog_spark.functions import (
    rs_field,
    rs_int2hex,
    rs_num2ipv4,
    rs_re_extract,
    rs_substring,
    rs_tolower,
    rs_wrap,
)
from rsyslog_spark.lookup import LookupTable, asof_enrich, enrich_join
from rsyslog_spark.oracle import ts3164, ts3339, with_parsed_oracle
from rsyslog_spark.parse import with_parsed
from rsyslog_spark.pipeline import build_flagship, role_dim_df, tool_dim_df
from rsyslog_spark.sources.transcripts import transcripts_spark
from rsyslog_spark.templates import compile_template, resolve_property

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_spark(spark, sf_dir)


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_parsed(_transcripts(spark, sf_dir), require_header=True)


def _ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _parsed(spark, sf_dir).filter(F.col("parse_success"))


def _archive_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    annotated, actions = build_flagship(_transcripts(spark, sf_dir))
    act = next(a for a in actions if a.sink == "archive")
    return annotated.filter(F.col(act.pred_col)).select(
        "conv_id", "turn_idx", F.col(act.out_col).alias("line")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse→enrich→route, archive sink's template lines."""
    return _archive_lines(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_parse_rfc3164(spark, sf_dir):
    p = _parsed(spark, sf_dir).filter(F.col("parser") == "rfc3164")
    return p.select(
        "i", "hostname", "syslogtag", "programname", "procid", "msg",
        "pri", "syslogfacility", "syslogseverity", "timereported",
    )


def q_parse_rfc5424(spark, sf_dir):
    p = _parsed(spark, sf_dir).filter(F.col("parser") == "rfc5424")
    return p.select(
        "i", "hostname", "app_name", "procid", "msgid",
        "structured_data", "msg", "timereported", "protocol_version",
    )


def q_parse_chain_stats(spark, sf_dir):
    return (
        _parsed(spark, sf_dir)
        .groupBy("parser", "parse_success")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("i").alias("lo"),
            F.max("i").alias("hi"),
        )
    )


def q_route_sink_counts(spark, sf_dir):
    annotated, actions = build_flagship(_transcripts(spark, sf_dir))
    pairs = ", ".join(f"'{a.sink}', {a.pred_col}" for a in actions)
    return (
        annotated.selectExpr(f"stack({len(actions)}, {pairs}) as (sink, hit)")
        .filter("hit")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_route_archive_lines(spark, sf_dir):
    return _archive_lines(spark, sf_dir)


def q_template_protocol23(spark, sf_dir):
    p = _parsed(spark, sf_dir).filter(F.col("parser") == "rfc5424")
    return p.select(
        "i", compile_template("RSYSLOG_SyslogProtocol23Format").alias("line")
    )


def q_prifilt_select(spark, sf_dir):
    p = _ok(spark, sf_dir)
    # reference cascade semantics (DecodePRIFilter, runtime/conf.c:350-478):
    # plain/'=' priorities OR into the mask; 'none' resets; '!' ANDs out.
    pred = prifilt_predicate(
        "*.err;local0.warning;mail.none;kern.!=err",
        F.col("syslogfacility"),
        F.col("syslogseverity"),
    )
    return p.filter(pred).select("i", "syslogfacility", "syslogseverity")


def q_propfilt_contains(spark, sf_dir):
    p = _ok(spark, sf_dir)
    pred = propfilt_predicate(resolve_property("msg"), "contains", "lazy")
    return p.filter(pred).select("i", "msg")


def q_enrich_sink_groups(spark, sf_dir):
    p = _parsed(spark, sf_dir)
    e = enrich_join(p, tool_dim_df(spark), on="tool",
                    nomatch={"tool_class": "unknown"})
    e = enrich_join(e, role_dim_df(spark), on="role",
                    nomatch={"sink_group": "unknown"})
    return e.groupBy("tool_class", "sink_group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("risk").cast("long")).alias("risk_sum"),
    )


def q_lookup_tool_class(spark, sf_dir):
    t = LookupTable(
        "tools",
        "string",
        {"bash": "exec", "search": "read", "editor": "write",
         "browser": "read", "": "none"},
        nomatch="unknown",
    )
    return _transcripts(spark, sf_dir).select(
        "i", "tool", t.lookup_expr(F.col("tool")).alias("tool_class")
    )


def q_asof_sev_bucket(spark, sf_dir):
    df = _transcripts(spark, sf_dir).withColumn(
        "k", (F.col("i") % 1500).cast("long")
    )
    out = asof_enrich(
        df,
        [(0, "low"), (100, "mid"), (500, "high"), (1000, "extreme")],
        key="k",
        out="bucket",
    )
    return out.select("i", "k", "bucket")


def q_dyn_inc_programname(spark, sf_dir):
    return A.dyn_inc(_ok(spark, sf_dir), "progs", "programname")


def q_mm_count_app_sev(spark, sf_dir):
    return A.mm_count(_ok(spark, sf_dir))


def q_mm_sequence_conv(spark, sf_dir):
    out = A.mm_sequence(
        _transcripts(spark, sf_dir).select("conv_id", "turn_idx"),
        partition_by="conv_id",
        order_by=("turn_idx",),
    )
    return out.select(
        "conv_id", "turn_idx", F.col("sequence").cast("long").alias("sequence")
    )


def q_seq_summary(spark, sf_dir):
    return W.seq_summary(_transcripts(spark, sf_dir))


def q_repeat_runs_role(spark, sf_dir):
    df = _transcripts(spark, sf_dir).select("conv_id", "turn_idx", "role")
    out = W.repeat_suppression(df, msg_col="role")
    return out.select("conv_id", "turn_idx", "role", "repeat_count")


def q_rate_limit(spark, sf_dir):
    out = W.rate_limit(
        _transcripts(spark, sf_dir), interval_s=60, burst=5
    )
    return out.select("conv_id", "turn_idx", "rl_keep")


def q_every_nth(spark, sf_dir):
    out = W.exec_only_every_nth(_transcripts(spark, sf_dir), n=3)
    return out.select("conv_id", "turn_idx", "nth_keep")


def q_once_per_interval(spark, sf_dir):
    out = W.exec_only_once_every_interval(
        _transcripts(spark, sf_dir), interval_s=600
    )
    return out.select("conv_id", "turn_idx", "once_keep")


def q_mm_jsonparse(spark, sf_dir):
    p = _ok(spark, sf_dir).filter(F.col("msg").startswith("{"))
    out = mods.mm_jsonparse(p)
    return out.select(
        "i",
        F.element_at("cee", "msgnum").cast("long").alias("msgnum"),
        F.element_at("cee", "lvl").alias("lvl"),
        "cee_parsed",
    )


def q_mm_fields(spark, sf_dir):
    out = mods.mm_fields(_ok(spark, sf_dir), sep=":")
    return out.select(
        "i",
        F.element_at("fields", "f1").alias("f1"),
        F.element_at("fields", "f2").alias("f2"),
        F.size("fields").cast("long").alias("nf"),
    )


def q_mm_rm1stspace(spark, sf_dir):
    return mods.mm_rm1stspace(_ok(spark, sf_dir)).select("i", "msg")


def q_mm_pstrucdata(spark, sf_dir):
    p = _parsed(spark, sf_dir).filter(F.col("parser") == "rfc5424")
    out = mods.mm_pstrucdata(p)
    return out.select(
        "i",
        F.element_at("sd", "id").alias("sd_id"),
        F.element_at("sd", "k").alias("k"),
    )


def q_rs_functions(spark, sf_dir):
    p = _ok(spark, sf_dir)
    return p.select(
        "i",
        rs_field(F.col("msg"), ":", 2).alias("fld"),
        rs_re_extract(F.col("msg"), "msgnum:([0-9]+)", 0, 1, "none").alias("ext"),
        rs_tolower(F.col("hostname")).alias("low"),
        rs_int2hex(F.col("i")).alias("hx"),
        rs_num2ipv4((F.col("i") * 9973) % 4294967296).alias("ip"),
        rs_div(F.col("i"), F.col("i") % 5).alias("dv"),
        rs_substring(F.col("msg"), 1, 6).alias("sub"),
        rs_wrap(F.col("programname"), '"').alias("wrapped"),
    )


def q_impstats(spark, sf_dir):
    return A.impstats(_parsed(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "parse_rfc3164": q_parse_rfc3164,
        "parse_rfc5424": q_parse_rfc5424,
        "parse_chain_stats": q_parse_chain_stats,
        "route_sink_counts": q_route_sink_counts,
        "route_archive_lines": q_route_archive_lines,
        "template_protocol23": q_template_protocol23,
        "prifilt_select": q_prifilt_select,
        "propfilt_contains": q_propfilt_contains,
        "enrich_sink_groups": q_enrich_sink_groups,
        "lookup_tool_class": q_lookup_tool_class,
        "asof_sev_bucket": q_asof_sev_bucket,
        "dyn_inc_programname": q_dyn_inc_programname,
        "mm_count_app_sev": q_mm_count_app_sev,
        "mm_sequence_conv": q_mm_sequence_conv,
        "seq_summary": q_seq_summary,
        "repeat_runs_role": q_repeat_runs_role,
        "rate_limit": q_rate_limit,
        "every_nth": q_every_nth,
        "once_per_interval": q_once_per_interval,
        "mm_jsonparse": q_mm_jsonparse,
        "mm_fields": q_mm_fields,
        "mm_rm1stspace": q_mm_rm1stspace,
        "mm_pstrucdata": q_mm_pstrucdata,
        "rs_functions": q_rs_functions,
        "impstats": q_impstats,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — see rsyslog_spark/oracle.py
# ---------------------------------------------------------------------------

_TRAD_LINE = (
    f"{ts3164('timereported')} || ' ' || hostname || ' ' || "
    "coalesce(syslogtag, '') || "
    "(CASE WHEN msg LIKE ' %' THEN '' ELSE ' ' END) || msg || chr(10)"
)

_P23_LINE = (
    "'<' || CAST(pri AS VARCHAR) || '>1 ' || "
    f"{ts3339('timereported')} || ' ' || hostname || ' ' || "
    "coalesce(app_name,'') || ' ' || coalesce(procid,'') || ' ' || "
    "coalesce(msgid,'') || ' ' || coalesce(structured_data,'') || ' ' || "
    "msg || chr(10)"
)


def oracle_sql() -> dict[str, str]:
    o = {}
    o["parse_rfc3164"] = with_parsed_oracle(
        "SELECT i, hostname, syslogtag, programname, procid, msg, pri, "
        "syslogfacility, syslogseverity, timereported "
        "FROM p WHERE parser = 'rfc3164'"
    )
    o["parse_rfc5424"] = with_parsed_oracle(
        "SELECT i, hostname, app_name, procid, msgid, structured_data, "
        "msg, timereported, protocol_version FROM p WHERE parser = 'rfc5424'"
    )
    o["parse_chain_stats"] = with_parsed_oracle(
        "SELECT parser, parse_success, count(*) AS n, min(i) AS lo, "
        "max(i) AS hi FROM p GROUP BY parser, parse_success"
    )
    o["route_sink_counts"] = with_parsed_oracle(
        "SELECT 'parse_errors' AS sink, count(*) AS n FROM p "
        "WHERE NOT parse_success "
        "UNION ALL SELECT 'sev_high', count(*) FROM p "
        "WHERE parse_success AND syslogseverity <= 3 "
        "UNION ALL SELECT 'exec_audit', count(*) FROM p "
        "WHERE parse_success AND role = 'tool' AND tool = 'bash' "
        "UNION ALL SELECT 'by_app', count(*) FROM p "
        "WHERE parse_success AND msg LIKE '%msgnum%' "
        "UNION ALL SELECT 'archive', count(*) FROM p WHERE parse_success"
    )
    o["route_archive_lines"] = with_parsed_oracle(
        f"SELECT conv_id, turn_idx, {_TRAD_LINE} AS line "
        "FROM p WHERE parse_success"
    )
    o["template_protocol23"] = with_parsed_oracle(
        f"SELECT i, {_P23_LINE} AS line FROM p WHERE parser = 'rfc5424'"
    )
    # '*.err;local0.warning;mail.none;kern.!=err' under conf.c:350-478
    # OR-cascade: all fac sev<=3; local0(16) also sev 4; mail(2) none;
    # kern(0) loses err(3) -> sev<=2.
    o["prifilt_select"] = with_parsed_oracle(
        "SELECT i, syslogfacility, syslogseverity FROM p WHERE parse_success "
        "AND CASE WHEN syslogfacility = 2 THEN FALSE "
        "WHEN syslogfacility = 16 THEN syslogseverity <= 4 "
        "WHEN syslogfacility = 0 THEN syslogseverity <= 2 "
        "ELSE syslogseverity <= 3 END"
    )
    o["propfilt_contains"] = with_parsed_oracle(
        "SELECT i, msg FROM p WHERE parse_success AND msg LIKE '%lazy%'"
    )
    _tool_class = (
        "CASE tool WHEN 'bash' THEN 'exec' WHEN 'search' THEN 'read' "
        "WHEN 'editor' THEN 'write' WHEN 'browser' THEN 'read' "
        "WHEN '' THEN 'none' ELSE 'unknown' END"
    )
    _risk = (
        "CASE tool WHEN 'bash' THEN 3 WHEN 'search' THEN 1 "
        "WHEN 'editor' THEN 2 WHEN 'browser' THEN 1 ELSE 0 END"
    )
    _sink_group = (
        "CASE role WHEN 'user' THEN 'ingress' WHEN 'assistant' THEN 'egress' "
        "WHEN 'tool' THEN 'exec' WHEN 'system' THEN 'control' "
        "ELSE 'unknown' END"
    )
    o["enrich_sink_groups"] = with_parsed_oracle(
        f"SELECT {_tool_class} AS tool_class, {_sink_group} AS sink_group, "
        f"count(*) AS n, CAST(sum({_risk}) AS BIGINT) AS risk_sum "
        "FROM p GROUP BY 1, 2"
    )
    o["lookup_tool_class"] = with_parsed_oracle(
        f"SELECT i, tool, {_tool_class} AS tool_class FROM t0"
    )
    o["asof_sev_bucket"] = with_parsed_oracle(
        "SELECT i, CAST(i % 1500 AS BIGINT) AS k, "
        "CASE WHEN i % 1500 >= 1000 THEN 'extreme' "
        "WHEN i % 1500 >= 500 THEN 'high' "
        "WHEN i % 1500 >= 100 THEN 'mid' ELSE 'low' END AS bucket FROM t0"
    )
    o["dyn_inc_programname"] = with_parsed_oracle(
        "SELECT 'progs' AS name, programname AS key, count(*) AS count "
        "FROM p WHERE parse_success GROUP BY programname"
    )
    o["mm_count_app_sev"] = with_parsed_oracle(
        "SELECT programname, syslogseverity, count(*) AS count "
        "FROM p WHERE parse_success GROUP BY 1, 2"
    )
    o["mm_sequence_conv"] = with_parsed_oracle(
        "SELECT conv_id, turn_idx, row_number() OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) AS sequence FROM t0"
    )
    o["seq_summary"] = with_parsed_oracle(
        "SELECT conv_id, count(*) AS n_turns, "
        "(min(turn_idx) = 0 AND max(turn_idx) = count(*) - 1 "
        "AND count(DISTINCT turn_idx) = count(*)) AS gap_free "
        "FROM t0 GROUP BY conv_id"
    )
    o["repeat_runs_role"] = with_parsed_oracle(
        "SELECT conv_id, min(turn_idx) AS turn_idx, min(role) AS role, "
        "count(*) - 1 AS repeat_count FROM ("
        "  SELECT conv_id, turn_idx, role, sum(chg) OVER "
        "  (PARTITION BY conv_id ORDER BY turn_idx) AS run FROM ("
        "    SELECT conv_id, turn_idx, role, CASE WHEN lag(role) OVER "
        "    (PARTITION BY conv_id ORDER BY turn_idx) IS DISTINCT FROM role "
        "    THEN 1 ELSE 0 END AS chg FROM t0)) "
        "GROUP BY conv_id, run"
    )
    o["rate_limit"] = with_parsed_oracle(
        "SELECT conv_id, turn_idx, row_number() OVER "
        "(PARTITION BY conv_id, date_trunc('minute', ts) ORDER BY turn_idx) "
        "<= 5 AS rl_keep FROM t0"
    )
    o["every_nth"] = with_parsed_oracle(
        "SELECT conv_id, turn_idx, (row_number() OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) % 3) = 0 AS nth_keep "
        "FROM t0"
    )
    o["once_per_interval"] = with_parsed_oracle(
        "SELECT conv_id, turn_idx, row_number() OVER "
        "(PARTITION BY conv_id, CAST(floor(epoch(ts) / 600) AS BIGINT) "
        "ORDER BY turn_idx) = 1 AS once_keep FROM t0"
    )
    o["mm_jsonparse"] = with_parsed_oracle(
        "SELECT i, CAST(i AS BIGINT) AS msgnum, "
        "CASE i % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' "
        "WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning' "
        "WHEN 5 THEN 'notice' WHEN 6 THEN 'info' ELSE 'debug' END AS lvl, "
        "TRUE AS cee_parsed FROM p "
        "WHERE parse_success AND msg LIKE '{%'"
    )
    o["mm_fields"] = with_parsed_oracle(
        "SELECT i, list_extract(string_split(msg, ':'), 1) AS f1, "
        "list_extract(string_split(msg, ':'), 2) AS f2, "
        "CAST(len(string_split(msg, ':')) AS BIGINT) AS nf "
        "FROM p WHERE parse_success"
    )
    o["mm_rm1stspace"] = with_parsed_oracle(
        "SELECT i, CASE WHEN msg LIKE ' %' THEN substr(msg, 2) ELSE msg END "
        "AS msg FROM p WHERE parse_success"
    )
    o["mm_pstrucdata"] = with_parsed_oracle(
        "SELECT i, 'exampleSDID@32473' AS sd_id, 'v' AS k FROM p "
        "WHERE parser = 'rfc5424'"
    )
    _k = "((i * 9973) % 4294967296)"
    o["rs_functions"] = with_parsed_oracle(
        "SELECT i, "
        "coalesce(list_extract(string_split(msg, ':'), 2), "
        "'***FIELD NOT FOUND***') AS fld, "
        "coalesce(nullif(regexp_extract(msg, 'msgnum:([0-9]+)', 1), ''), "
        "'none') AS ext, "
        "lower(hostname) AS low, "
        "lower(to_hex(i)) AS hx, "
        f"CAST({_k} // 16777216 % 256 AS VARCHAR) || '.' || "
        f"CAST({_k} // 65536 % 256 AS VARCHAR) || '.' || "
        f"CAST({_k} // 256 % 256 AS VARCHAR) || '.' || "
        f"CAST({_k} % 256 AS VARCHAR) AS ip, "
        "CAST(CASE WHEN i % 5 = 0 THEN 0 ELSE i // (i % 5) END AS BIGINT) "
        "AS dv, "
        "substr(msg, 2, 6) AS sub, "
        "'\"' || programname || '\"' AS wrapped "
        "FROM p WHERE parse_success"
    )
    o["impstats"] = with_parsed_oracle(
        "SELECT 'core.submitted' AS counter, CAST(count(*) AS BIGINT) "
        "AS value FROM p "
        "UNION ALL SELECT 'core.parse_failures', CAST(count(*) AS BIGINT) "
        "FROM p WHERE NOT parse_success "
        "UNION ALL SELECT 'core.processed', CAST(count(*) AS BIGINT) "
        "FROM p WHERE parse_success"
    )
    return o
