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

import os as _os

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
    return act.output(annotated).select(
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
    # r5 facet: parser(type="pmrfc3164") instance options
    # (tools/pmrfc3164.c:63-70) — a synthetic line exercising
    # permit.slashesInHostname + force.tagEndingByColon + the ungated
    # hour-position year (datetime.c:678-690) through the custom-chain
    # branch; alternating rows lack the TAG colon and get the '-' TAG
    # + p2parse -= (i+1) restore (the pre-TAG SP re-enters MSG)
    from rsyslog_spark.parse.chain_custom import build_custom_chain

    i_s = F.col("i").cast("string")
    sline = F.concat(
        F.lit("<13>Mar 10 "), (2000 + F.col("i") % 100).cast("string"),
        F.lit(" 01:00:0"), (F.col("i") % 6).cast("string"),
        F.lit(" host/"), i_s,
        F.when(F.col("i") % 2 == 0, F.lit(" tag: m")).otherwise(
            F.lit(" tagnc m")
        ),
    )
    cc = build_custom_chain(
        p.select("i", sline.alias("text"), F.col("ts")),
        [{
            "name": "opt3164", "type": "pmrfc3164",
            "permit.slashesinhostname": "on",
            "force.tagendingbycolon": "on",
        }],
    ).select(
        "i",
        F.col("hostname").alias("p3_host"),
        F.col("syslogtag").alias("p3_tag"),
        F.col("msg").alias("p3_msg"),
        F.col("timereported").alias("p3_ts"),
    )
    return p.select(
        "i", "hostname", "syslogtag", "programname", "procid", "msg",
        "pri", "syslogfacility", "syslogseverity", "timereported",
    ).join(cc, "i")


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


_SEVNAMES = ["emerg", "alert", "crit", "err",
             "warning", "notice", "info", "debug"]


def q_lookup_array(spark, sf_dir):
    """Array-type lookup table (dense uint index -> value, lookup.c
    array tables): constant-map probe, out-of-range -> nomatch."""
    t = LookupTable(
        "sevnames", "array",
        {str(k): v for k, v in enumerate(_SEVNAMES)},
        nomatch="?",
    )
    return _transcripts(spark, sf_dir).select(
        "i",
        t.lookup_expr((F.col("i") % 10).cast("string")).alias("sev_name"),
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


def q_dyn_inc_counters(spark, sf_dir):
    """dynstats counter buckets in one driver row (consolidated from
    the former dyn_inc_programname + dyn_inc_capped pair): the plain
    'progs' bucket (dyn_inc, rainerscript.c:2531-2550) and the
    maxCardinality-capped 'hosts' bucket with its ops_overflow row
    (dynstats.c:517) — same (name, key, count) schema, computed in ONE
    pass over the parse via dyn_inc_multi (a per-bucket union would
    re-execute the 100 TB parse once per bucket)."""
    return A.dyn_inc_multi(
        _ok(spark, sf_dir),
        [("progs", "programname", 0), ("hosts", "hostname", 5)],
    )


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


def q_sampling_gates(spark, sf_dir):
    """Four rate/sampling operators in one driver row (consolidated so
    every facet fits the driver's 50-query window — r02 VERDICT #1):
    ratelimit interval+burst (ratelimit.c:145-205), its severity bypass
    (ratelimit.c:253-255,397-399), execOnlyEveryNthTime
    (action.c:1865-1885), execOnlyOnceEveryInterval (action.c:1892-97).
    Each op appends its own keep flag on the SAME frame — per-row
    verification of all four at once."""
    p = _parsed(spark, sf_dir)
    out = W.rate_limit(p, interval_s=60, burst=5)
    out = W.rate_limit(out, interval_s=60, burst=3, severity=4,
                       keep_col="rl_sev_keep")
    out = W.exec_only_every_nth(out, n=3)
    out = W.exec_only_once_every_interval(out, interval_s=600)
    return out.select(
        "conv_id", "turn_idx", "rl_keep", "rl_sev_keep",
        "nth_keep", "once_keep",
    )


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
    """mmfields splitting + mmrm1stspace in one row (consolidated):
    fields computed from the ORIGINAL msg, then the leading-space strip
    applied — both per-row, zero extra shuffle."""
    out = mods.mm_rm1stspace(mods.mm_fields(_ok(spark, sf_dir), sep=":"))
    return out.select(
        "i",
        F.element_at("fields", "f1").alias("f1"),
        F.element_at("fields", "f2").alias("f2"),
        F.size("fields").cast("long").alias("nf"),
        "msg",
    )


def q_mm_pstrucdata(spark, sf_dir):
    p = _parsed(spark, sf_dir).filter(F.col("parser") == "rfc5424")
    out = mods.mm_pstrucdata(p)
    return out.select(
        "i",
        F.element_at("sd", "id").alias("sd_id"),
        F.element_at("sd", "k").alias("k"),
    )


def q_rs_functions(spark, sf_dir):
    """The whole scalar-function registry in one driver row
    (rainerscript.c:3730-3763; consolidates the former rs_functions +
    rs_functions2 pair — all per-row Column expressions, one scan)."""
    from rsyslog_spark.functions import (
        rs_format_time,
        rs_ipv42num,
        rs_is_time,
        rs_parse_time,
        rs_replace,
        rs_strlen,
    )

    p = _ok(spark, sf_dir)
    ip = rs_num2ipv4((F.col("i") * 9973) % 4294967296)
    return p.select(
        "i",
        rs_field(F.col("msg"), ":", 2).alias("fld"),
        rs_re_extract(F.col("msg"), "msgnum:([0-9]+)", 0, 1, "none").alias("ext"),
        rs_tolower(F.col("hostname")).alias("low"),
        rs_int2hex(F.col("i")).alias("hx"),
        ip.alias("ip"),
        rs_div(F.col("i"), F.col("i") % 5).alias("dv"),
        rs_substring(F.col("msg"), 1, 6).alias("sub"),
        rs_wrap(F.col("programname"), '"').alias("wrapped"),
        rs_parse_time(F.col("timestamp_text")).alias("pt"),
        rs_is_time(F.col("timestamp_text")).alias("ist"),
        rs_format_time(F.col("i") * 1000 + 7, "date-rfc3164").alias("ft64"),
        rs_format_time(F.col("i") * 1000 + 7, "date-rfc3339").alias("ft39"),
        rs_strlen(F.col("msg")).alias("sl"),
        rs_replace(F.col("msg"), "the", "THE").alias("rep"),
        rs_wrap(F.col("msg"), '"', "#").alias("w3"),
        rs_ipv42num(ip).alias("ipn"),
        rs_ipv42num(F.col("hostname")).alias("ipbad"),
    )


def q_impstats(spark, sf_dir):
    return A.impstats(_parsed(spark, sf_dir))


_CONF_TEXT = """
ruleset(name="txt") {
    if not $parsesuccess then {
        action(type="omfile" file="/log/parse_errors.log")
        stop
    }
    if prifilt("kern,user.crit") then {
        action(type="omfile" file="/log/kern_crit.log")
    }
    if $programname == ["chat", "kernelish"] then {
        action(type="omfile" file="/log/apps.log")
    }
    if $msg contains "lazy" and $syslogseverity >= 4 then {
        action(type="omfile" file="/log/lazy_low.log")
    }
    action(type="omfile" file="/log/rest.log")
}
"""


def q_config_text_routing(spark, sf_dir):
    """rsyslog.conf text -> compiled routing (config-as-query lifecycle,
    SURVEY §3.1) -> exact per-sink counts."""
    from rsyslog_spark.config import compile_config

    ann, actions = compile_config(
        _parsed(spark, sf_dir), _CONF_TEXT, entry="txt"
    )
    pairs = ", ".join(f"'{a.sink}', {a.pred_col}" for a in actions)
    return (
        ann.selectExpr(f"stack({len(actions)}, {pairs}) as (sink, hit)")
        .filter("hit")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_template_options(spark, sf_dir):
    """Per-FIELD option pipeline (msg.c:3526 onward): field extraction,
    substring+case, csv escape, regex w/ **NO MATCH**, compress+json."""
    p = _ok(spark, sf_dir)
    return p.select(
        "i",
        compile_template("%msg:F,58:2%").alias("f2"),
        compile_template("%msg:2:8:uppercase%").alias("sub"),
        compile_template("%hostname:::csv%").alias("hostcsv"),
        # reference subfield order: R,<type>,<submatch>,<nomatch>,<match>
        compile_template("%msg:R,ERE,1,DFLT,0:msgnum.([0-9]+)%").alias("rex"),
        compile_template("%msg:::compressspace,json%").alias("jmsg"),
    )


def q_mm_rewrite(spark, sf_dir):
    """mmanon IP anonymization + mmnormalize field extraction in one
    driver row (consolidated). ONE pass: mmnormalize extracts from the
    original msg FIRST (its fields land in the 'norm' map), then the
    frame's msg is rewritten with IPs and mmanon masks it — sequencing
    the mutations replaces the former two-parse self-join on i."""
    norm = mods.mm_normalize(
        _ok(spark, sf_dir),
        rules=[
            ("msgnum", "msgnum:([0-9]+)", 1),
            ("first_word", "^ ?([a-z]+)", 1),
        ],
    )
    # r4 facet: the liblognorm v1 rulebase engine (first-match cascade
    # + annotate= constant), bound to the ORIGINAL msg before the
    # rewrite mutates the frame — rule NUM matches the leading-space
    # msgnum shape, the untagged catch-all takes the rest
    rb = (
        "rule=NUM: msgnum:%num:number% %w1:word% %rest:rest%\n"
        'annotate=NUM:+src="rb"\n'
        "rule=:%any:rest%"
    )
    norm = norm.withColumn(
        "rbmap",
        mods.rulebase_map_expr(
            F.coalesce(F.col("msg"), F.lit("")), mods.parse_rulebase(rb)
        ),
    )
    # r5 facets: mmaudit / mmtaghostname / mmrfc5424addhmac through the
    # real module code paths.
    # mmaudit: synthesized audit lines (i%5!=0) through the byte-exact
    # walk — auditid reproduces the sizeof(" audit(") first-char-drop
    # quirk; i%5==0 rows are non-audit and must yield NULL facets
    i_s = F.col("i").cast("string")
    norm = norm.withColumn(
        "audit_line",
        F.when(
            F.col("i") % 5 != 0,
            F.concat(
                F.lit("type="), (F.col("i") % 3).cast("string"),
                F.lit(" audit("), i_s, F.lit(".5:7): seq="), i_s,
                F.lit(' op="x y"'),
            ),
        ).otherwise(F.lit("not an audit line")),
    )
    norm = mods.mm_audit(norm, msg_col="audit_line", vars_col="auditvars")
    # r5 facet: mmgrok over the real msg (search semantics, composite
    # patterns, typed-key suffix ignored)
    norm = mods.mm_grok(
        norm, "msgnum:%{NONNEGINT:gnum:int} %{WORD:gword}",
        target="!gk", source_col="msg", vars_col="grokvars",
    )
    # r5 facet: the four new liblognorm v1 field types over a
    # natively-built device line (mac from i's octets, float, ipv6
    # constant, name-value-list span)
    def _oct(c):
        return F.lower(F.lpad(F.hex(c.cast("int")), 2, "0"))

    mac = F.concat_ws(
        ":", _oct(F.col("i") % 256), _oct((F.col("i") * 7) % 256),
        _oct((F.col("i") * 13) % 256), F.lit("00"), F.lit("1b"),
        F.lit("63"),
    )
    dev_line = F.concat(
        F.lit("dev "), mac, F.lit(" t="), i_s, F.lit("."),
        (F.col("i") % 10).cast("string"), F.lit(" ip6=::1 kv=a="), i_s,
        F.lit(" b=2"),
    )
    rb2 = (
        "rule=DEV:dev %mac:mac48% t=%t:float% ip6=%a6:ipv6% "
        "kv=%kv:name-value-list%"
    )
    norm = norm.withColumn("dev_line", dev_line).withColumn(
        "rb2map",
        mods.rulebase_map_expr(F.col("dev_line"), mods.parse_rulebase(rb2)),
    )
    # r5 facet, second batch: duration / hexnumber / time-24hr /
    # kernel-timestamp / iptables-span / string-to (multi-char stop,
    # not consumed) / whitespace-discard, one anchored rule over a
    # natively-built session line (closed-form for the oracle)
    sess_line = F.concat(
        F.lit("sess  ["), (F.col("i") + 10000).cast("string"),
        F.lit(".000042] "), (F.col("i") % 100).cast("string"),
        F.lit(":05:09 id=0x"), F.lower(F.hex(F.col("i"))),
        F.lit(" at "),
        F.lpad((F.col("i") % 24).cast("string"), 2, "0"),
        F.lit(":30:59 IN=eth0 OUT= SRC=10.0.0."),
        (F.col("i") % 256).cast("string"),
        F.lit(" note w"), i_s, F.lit(" x END"),
    )
    rb3 = (
        "rule=SESS:sess%-:whitespace%%kts:kernel-timestamp% "
        "%d:duration% id=%h:hexnumber% at %t24:time-24hr% "
        "%ipt:iptables% note %note:string-to: END% END"
    )
    norm = norm.withColumn("sess_line", sess_line).withColumn(
        "rb3map",
        mods.rulebase_map_expr(F.col("sess_line"), mods.parse_rulebase(rb3)),
    )
    # r5 facet: mmsnmptrapd — i%3==0 rows get a synthetic
    # snmptrapd/<sev>/<host>: TAG (sev name alternates mapped /
    # unmapped to pin both lookup branches); the rewrite's outputs
    # are snapshotted into snmp_* facets before mmtaghostname
    # replaces the tag again
    trap_sev = F.when(
        F.col("i") % 2 == 0, F.lit("warning")
    ).otherwise(F.lit("bogus"))
    norm = norm.withColumn(
        "syslogtag",
        F.when(
            F.col("i") % 3 == 0,
            F.concat(
                F.lit("snmptrapd/"), trap_sev, F.lit("/origin-"), i_s,
                F.lit(":"),
            ),
        ).otherwise(F.col("syslogtag")),
    )
    norm = mods.mm_snmptrapd(norm, severity_mapping="warning/2,error/0")
    norm = (
        norm.withColumn("snmp_tag", F.col("syslogtag"))
        .withColumn("snmp_host", F.col("hostname"))
        .withColumn("snmp_sev", F.col("syslogseverity"))
        .withColumn("snmp_pri", F.col("pri"))
    )
    # r5 facet: mmexternal — the repo-shipped line-protocol plugin
    # (tools/external_msgmod.py) over interface.input="msg": rows whose
    # MSG carries msgnum:<digits> (classes 0-7; class 8's JSON line has
    # a quote between 'msgnum' and ':') get msgid=X<n> via the
    # well-known walk plus a $!ext subtree merge; others reply '{}'
    from rsyslog_spark.external import mm_external as _mm_external

    _ext_bin = "python3 " + _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "tools", "external_msgmod.py",
    )
    norm = _mm_external(
        norm, _ext_bin, interface_input="msg", vars_col="extvars"
    )
    # r5 facet: omprog — the repo-shipped program sink
    # (tools/prog_sink.py) with confirmMessages: per-row delivery
    # status from the child's OK / Error replies (rows whose msgnum is
    # 3 mod 7 are rejected by the program)
    from rsyslog_spark.external import om_prog as _om_prog

    _prog_bin = "python3 " + _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "tools", "prog_sink.py",
    )
    norm = _om_prog(
        norm, "msg", _prog_bin, confirm_messages=True,
        status_col="prog_status",
    )
    # r5 facet: mmdblookup — GeoIP-style enrichment from the committed
    # MMDB fixture (tools/fixtures/geo.mmdb, written by the pure-Python
    # writer): i%4==3 rows carry an address outside the DB (no-op),
    # others hit 10/8 or 192.168/16
    _geo = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "tools", "fixtures", "geo.mmdb",
    )
    dbl_ip = F.when(
        F.col("i") % 4 == 3, F.lit("203.0.113.9")
    ).when(
        F.col("i") % 4 == 0,
        F.concat(F.lit("192.168."), (F.col("i") % 200).cast("string"),
                 F.lit(".4")),
    ).otherwise(
        F.concat(F.lit("10."), (F.col("i") % 200).cast("string"),
                 F.lit(".0.7"))
    )
    norm = norm.withColumn(
        "dblvars", F.create_map(F.lit("ip"), dbl_ip)
    )
    norm = mods.mm_dblookup(
        norm, key="$!ip", mmdbfile=_geo,
        fields=["city", ":country:cc"], vars_col="dblvars",
    )
    # mmtaghostname: tag= replaces the TAG wholesale (programname
    # re-derived, stops at '['), forcelocalhostname pins hostname
    norm = mods.mm_taghostname(
        norm, tag="relay[7]:x", force_localhostname=True,
        localhostname="frontAPP",
    )
    # mmrfc5424addhmac: RFC5424 rows get [hm@1 hash="<hmac>"] appended
    # to their SD; the digest is masked to 'H' for the oracle (DuckDB
    # has no binary sha256 to build an HMAC from — byte-exact digest
    # goldens live in tests/test_mm_modules.py)
    norm = mods.mm_rfc5424addhmac(
        norm, key="s3cr3t", hashfunction="sha256", sd_id="hm@1"
    )
    anon_in = norm.withColumn(
        "msg",
        F.concat(
            F.lit("src="),
            rs_num2ipv4((F.col("i") * 2654435761) % 4294967296),
            F.lit(" dst=10.1.2.3 "),
            F.col("msg"),
        ),
    )
    return mods.mm_anon(anon_in, bits=16).select(
        "i",
        F.col("msg").alias("anon_msg"),
        F.element_at("norm", "msgnum").alias("msgnum"),
        F.element_at("norm", "first_word").alias("first_word"),
        F.element_at("rbmap", "num").alias("rb_num"),
        F.element_at("rbmap", "w1").alias("rb_w1"),
        F.element_at("rbmap", "src").alias("rb_src"),
        F.element_at("auditvars", "audit!hdr!auditid").alias("au_id"),
        F.element_at("auditvars", "audit!hdr!type").alias("au_type"),
        F.element_at("auditvars", "audit!data!seq").alias("au_seq"),
        F.element_at("auditvars", "audit!data!op").alias("au_op"),
        F.col("syslogtag").alias("th_tag"),
        F.col("programname").alias("th_prog"),
        F.col("hostname").alias("th_host"),
        F.regexp_replace(
            F.col("structured_data"), "[0-9a-f]{64}", "H"
        ).alias("hm_shape"),
        F.element_at("grokvars", "gk!gnum").alias("gk_num"),
        F.element_at("grokvars", "gk!gword").alias("gk_word"),
        F.element_at("rb2map", "mac").alias("ln_mac"),
        F.element_at("rb2map", "t").alias("ln_t"),
        F.element_at("rb2map", "a6").alias("ln_a6"),
        F.element_at("rb2map", "kv").alias("ln_kv"),
        F.element_at("rb3map", "kts").alias("ln_kts"),
        F.element_at("rb3map", "d").alias("ln_dur"),
        F.element_at("rb3map", "h").alias("ln_hex"),
        F.element_at("rb3map", "t24").alias("ln_t24"),
        F.element_at("rb3map", "ipt").alias("ln_ipt"),
        F.element_at("rb3map", "note").alias("ln_note"),
        "snmp_tag",
        "snmp_host",
        "snmp_sev",
        "snmp_pri",
        F.element_at("extvars", "ext!mn").alias("ext_mn"),
        F.element_at("extvars", "ext!prog").alias("ext_prog"),
        F.col("msgid").alias("ext_msgid"),
        "prog_status",
        F.element_at("dblvars", "iplocation!city").alias("dbl_city"),
        F.element_at("dblvars", "iplocation!country").alias("dbl_cc"),
    )


_CONF_FE = """
template(name="kv" type="string" string="%$.e!key%=%$.e!value%")
ruleset(name="fe") {
    if parse_json($msg, "$!doc") == 0 then {
        foreach ($.e in $!doc) do {
            action(type="omfile" file="/log/pairs.log" template="kv")
        }
    }
}
"""


def q_foreach_vars(spark, sf_dir):
    """S_FOREACH over a JSON object in the $! tree (execForeach,
    runtime/ruleset.c:322-418; tests/json_object_looping.sh): one output
    row per {key,value} pair, via the config-text grammar end to end."""
    from rsyslog_spark.config import compile_config

    ann, actions = compile_config(_ok(spark, sf_dir), _CONF_FE, entry="fe")
    a = actions[0]
    return a.output(ann).select(
        "i",
        F.element_at("vars", ".e!key").alias("k"),
        F.element_at("vars", ".e!value").alias("v"),
        F.col(a.out_col).alias("line"),
    )


_CONF_CI = """
ruleset(name="sev0" queue.type="linkedlist") {
    set $!t = "queued";
    action(type="omfile" file="/log/urgent.log")
    stop
}
ruleset(name="sev1") {
    action(type="omfile" file="/log/routine.log")
    stop
}
ruleset(name="ci") {
    set $!t = "pre";
    call_indirect "sev" & cstr($syslogseverity / 4);
    action(type="omfile" file="/log/tail.log")
}
"""


def q_call_indirect(spark, sf_dir):
    """call_indirect to a computed ruleset name (execCallIndirect,
    ruleset.c:241-281) + queued-call isolation (execCall MsgDup branch,
    :283-302; tests/omruleset-queue.sh): 'sev0' has its own queue so its
    stop/set do NOT affect the caller; 'sev1' is inline so its stop
    does. 'vars_pre' proves the queued set never leaked."""
    from rsyslog_spark.config import compile_config

    ann, actions = compile_config(_ok(spark, sf_dir), _CONF_CI, entry="ci")
    pairs = ", ".join(f"'{a.sink}', {a.pred_col}" for a in actions)
    stacked = (
        ann.selectExpr(f"stack({len(actions)}, {pairs}) as (sink, hit)")
        .filter("hit")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pre = (
        ann.filter(F.element_at(F.col("vars"), "t") == "pre")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("vars_pre").alias("sink"), "n")
    )
    return stacked.unionByName(pre)


_CONF_CALC = """
ruleset(name="calc") {
    set $.code = ($syslogseverity * 8 + $syslogfacility) % 100;
    set $.fld = field($msg, 58, 2);
    set $.hex = int2hex($syslogseverity * 256 + 7);
    set $.neg = -$syslogseverity + 2;
    set $.ok = parse_json($msg, "$!doc");
    set $.e1 = script_error();
    set $.lvl = get_property($!doc, "lvl");
    set $.pt = parse_time($msg);
    set $.e2 = script_error();
    set $.sum = $.code & "-" & cstr($syslogseverity);
}
"""


def q_config_text_calc(spark, sf_dir):
    """Config-grammar completeness: arithmetic with the reference
    precedence table (grammar.y:120-124) incl. div-0->0 and unary minus,
    function registry calls (field with char-code delim, int2hex, cstr —
    rainerscript.c:3730-3763), parse_json into a container
    (rainerscript.c:1795-1820), get_property member access (:1834-1944),
    and the script_error() channel after a failed parse_time (:2693)."""
    from rsyslog_spark.config import compile_config

    ann, _ = compile_config(_ok(spark, sf_dir), _CONF_CALC, entry="calc")
    # $. locals live under '.'-prefixed keys since r5 (distinct from $!)
    v = lambda k: F.element_at(F.col("vars"), "." + k)  # noqa: E731
    return ann.select(
        "i",
        v("code").cast("long").alias("code"),
        v("fld").alias("fld"),
        v("hex").alias("hex"),
        v("neg").cast("long").alias("neg"),
        v("e1").cast("int").alias("e1"),
        v("lvl").alias("lvl"),
        v("pt").cast("long").alias("pt"),
        v("e2").cast("int").alias("e2"),
        v("sum").alias("sum_s"),
    )


def q_pm_lastmsg(spark, sf_dir):
    """pmlastmsg on top of the parser stack (plugins/pmlastmsg/
    pmlastmsg.c:90-130; tests/pmlastmsg.sh): 'last message repeated N
    times' rows take MSG = whole after-PRI text, TAG '', legacy
    protocol, TS = received time."""
    i = F.col("i")
    t = _transcripts(spark, sf_dir).withColumn(
        "text",
        F.when(
            i % 50 == 0,
            F.concat(
                F.lit("<"),
                ((i % 24) * 8 + i % 8).cast("string"),
                F.lit(">last message repeated "),
                (i % 9).cast("string"),
                F.lit(" times"),
            ),
        ).otherwise(F.col("text")),
    )
    p = with_parsed(
        t, require_header=True,
        parsers=("lastmsg", "rfc5424", "rfc3164"),
    )
    return p.filter(F.col("parser") == "lastmsg").select(
        "i", "msg", "syslogtag", "protocol_version", "hostname"
    )


def q_dyn_inc_cycles(spark, sf_dir):
    """dynstats bucket lifecycle in one driver row (consolidated):
    resettable counters (dynstats.c:36-38,489 CTR_FLAG_MUST_RESET;
    tests/dynstats_reset.sh) as the 'roles' bucket, plus the
    unusedMetricLife TTL purge (dynstats.c:249-264) as 'ttl' vs the
    no-TTL cumulative control 'cum' on a bursty subset. All three share
    the (name, key, window_start, count) schema."""
    t = _transcripts(spark, sf_dir)
    reset = A.dyn_inc_windowed(
        t, "roles", "role", ts_col="ts", interval_s=600, resettable=True,
    )
    bursty = t.filter((F.col("i") % 3000) < 600)
    ttl = A.dyn_inc_windowed(
        bursty, "ttl", "role", ts_col="ts", interval_s=600,
        resettable=False, unused_metric_life_s=1200,
    )
    cum = A.dyn_inc_windowed(
        bursty, "cum", "role", ts_col="ts", interval_s=600,
        resettable=False,
    )
    return reset.unionByName(ttl).unionByName(cum)


def q_parse_uncompress(spark, sf_dir):
    """zlib uncompress front door (uncompressMessage, runtime/
    parser.c:312-362): round-trip — a third of the rows ship as
    'z'+zlib(text) binary records (tcpflood -C wire format), corrupted
    records are DROPPED ('Message ignored', parser.c:349-354), and the
    parse results must be byte-identical to the uncompressed path."""
    from rsyslog_spark.parse.uncompress import (
        compress_records,
        with_uncompressed,
    )

    t = _transcripts(spark, sf_dir)
    wire = compress_records(
        t, select_expr="i % 3 = 0", corrupt_expr="i % 97 = 0"
    )
    restored = with_uncompressed(wire, raw_col="raw", out_col="text")
    p = with_parsed(restored, require_header=True)
    return p.select("i", "parser", "msg")


def q_multiline(spark, sf_dir):
    """imfile multi-line assembly (startmsg.regex, plugins/imfile/
    imfile.c:324,1921; strm ReadMultiLine): lines not opening with a PRI
    header are continuations of the previous message; one window cumsum
    + one groupBy, per-conversation bounded."""
    out = W.multiline_assemble(
        _transcripts(spark, sf_dir),
        start_re="^<",
        partition_by="conv_id",
        order_by="turn_idx",
    )
    return out.select(
        "conv_id", "msg_seq", "first_turn_idx",
        F.col("n_lines").cast("long").alias("n_lines"), "msg_text",
    )


def q_sys_time_props(spark, sf_dir):
    """System time properties $now/$year/.../$wday (PROP_SYS_*,
    msg.c:755-793; rendering getNOW msg.c:2996-3051), evaluated against
    timegenerated (deterministic processing time)."""
    p = _ok(spark, sf_dir)
    return p.select(
        "i",
        compile_template(
            "%$now% %$hour%:%$minute% h%$hhour% q%$qhour% w%$wday% "
            "u%$now-unixtimestamp%"
        ).alias("line"),
    )


def q_immark_rows(spark, sf_dir):
    """immark heartbeat injection (plugins/immark/immark.c:55-63,
    201-203): one '-- MARK --' row per elapsed period over the event-
    time span, unioned into the stream shape."""
    from rsyslog_spark.sources.mark import with_marks

    out = with_marks(_transcripts(spark, sf_dir), period_s=600)
    return out.filter(F.col("conv_id") == "--mark--").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def q_rate_limit_severity(spark, sf_dir):
    """ratelimit severity gate (ratelimit.c:253-255,397-399): messages
    more important than the threshold bypass the limiter AND do not
    consume burst budget."""
    out = W.rate_limit(
        _parsed(spark, sf_dir), interval_s=60, burst=3, severity=4
    )
    return out.select("conv_id", "turn_idx", "rl_keep")


_CONF_FO = """
ruleset(name="fo") {
    if $syslogseverity <= 3 then {
        action(type="omfile" file="/log/pri_crit.log"
               action.errorfile="/log/err_crit.log")
        action(type="omfile" file="/log/alt_crit.log"
               action.execOnlyWhenPreviousIsSuspended="on")
    }
    action(type="omfile" file="/log/pri_all.log")
    action(type="omfile" file="/log/alt_all.log"
           action.execOnlyWhenPreviousIsSuspended="on")
}
"""


def q_failover(spark, sf_dir):
    """Action suspension + execOnlyWhenPreviousIsSuspended failover
    (action.c:1812-1815; reference tests
    execonlywhenpreviousissuspended*.sh): pri_crit is marked down, so
    its failover alt_crit receives exactly the crit-path rows AND its
    action.errorfile (actionWriteErrorFile JSON capture,
    action.c:1410-1466) records the same rows; pri_all is healthy, so
    alt_all receives nothing (absent from counts)."""
    from rsyslog_spark.config import compile_config

    ann, actions = compile_config(
        _parsed(spark, sf_dir), _CONF_FO, entry="fo",
        suspended_sinks={"pri_crit"},
    )
    pairs = ", ".join(f"'{a.sink}', {a.pred_col}" for a in actions)
    return (
        ann.selectExpr(f"stack({len(actions)}, {pairs}) as (sink, hit)")
        .filter("hit")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_bre_propfilt(spark, sf_dir):
    """Legacy ``regex`` propfilt op in its actual POSIX BRE dialect
    (evalPROPFILT ruleset.c:446-535 compiles WITHOUT REG_EXTENDED):
    escaped parens/braces are operators, bare ones and +?| literals —
    translated token-by-token to the Java rlike dialect
    (filters.bre_to_java)."""
    from rsyslog_spark.filters import propfilt_predicate

    p = _ok(spark, sf_dir)
    return p.select(
        "i",
        propfilt_predicate(
            F.col("msg"), "regex", r"\(lazy\|msgnum:1[0-9]\{2\}\)"
        ).alias("m_bre"),
        propfilt_predicate(
            F.col("msg"), "regex", "(parens) q+"
        ).alias("m_lit"),
    )


def q_octet_framing(spark, sf_dir):
    """Octet-counting AND octet-stuffing stream framing round-trip
    (omfwd.c:1195 "%d %s" frames / :1308-1310 LF trailer; imtcp
    consumes both): per conversation, frame every message into one
    byte stream, split it back, and recover each message at its
    in-stream position. One Arrow split pass + one posexplode."""
    from rsyslog_spark.parse.framing import (
        frame_octet_counted,
        split_octet_counted,
        split_octet_stuffed,
    )

    t = _transcripts(spark, sf_dir)
    framed = t.select(
        "conv_id", "turn_idx",
        frame_octet_counted(F.col("text")).alias("fr"),
        F.concat(F.col("text"), F.lit("\n")).alias("st"),
    )

    def _stream(col):
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", col))),
                lambda x: x[col],
            ),
            "",
        )

    streams = framed.groupBy("conv_id").agg(
        _stream("fr").alias("buf"), _stream("st").alias("sbuf")
    )
    counted = split_octet_counted(streams.select("conv_id", "buf")).select(
        "conv_id", "frame_idx", "text", F.lit("counted").alias("mode")
    )
    stuffed = split_octet_stuffed(
        streams.select("conv_id", F.col("sbuf").alias("buf"))
    ).select(
        "conv_id", "frame_idx", "text", F.lit("stuffed").alias("mode")
    )
    return counted.unionByName(stuffed)


# --- training-data ops (rsyslog_spark.dataops) -----------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _embs_structured(spark, sf_dir):
    """Topic-clustered corpus for the ANN top-k facets, derived
    deterministically from the sf embeddings (the planted-twin pattern
    that fixed embedding_neardup, r3 verdict #3): the raw sf vectors
    are isotropic noise (max pairwise cos ~0.55) where ANY blocked ANN
    is information-theoretically ~random, so the demo showed the
    family where it is meaningless. Planting 16 axis-aligned topic
    spikes — +4.0 on dims d with d%16 == vec_id%16 — makes a vector's
    true top-k its own topic cluster (measured: brute top-5 is 100%
    same-topic), so LSH/IVF recall vs the in-row brute facet becomes a
    meaningful number (PERF.md: 0.94 / 0.88 at the query's operating
    points). The oracle applies the identical transform, so double
    math stays IEEE-identical across engines."""
    e = _embs(spark, sf_dir)
    topic = (F.col("vec_id") % 16).cast("int")
    return e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i % 16 == topic, F.lit(4.0)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )


def q_dedup_exact(spark, sf_dir):
    from rsyslog_spark.dataops.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the GPT-3 appendix-C 13-gram overlap
    heuristic): eval set = docs with doc_id %% 10 = 7; every corpus doc
    reports its distinct-13-gram count, eval-hit count, hit fraction,
    and the contaminated flag at threshold 0.8. engine='set': the eval
    grams travel as a hashed broadcast set and the corpus side is ONE
    shuffle-free mapInPandas pass — the only shape that works when the
    corpus is 100 TB and the benchmark suite is megabytes."""
    from rsyslog_spark.dataops.decontam import kgram_contamination

    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 10 == 7)
    return kgram_contamination(docs, ev, k=13, threshold=0.8)


def q_dedup_minhash(spark, sf_dir):
    """MinHash pipeline in one driver row (consolidated): the banded
    signatures facet ('sig' rows) AND the candidate-pair + exact-Jaccard
    facet ('pair' rows) — both derived from ONE persisted shingle frame,
    unioned with a facet discriminator so each stage gets its own
    driver-verified values."""
    from rsyslog_spark.dataops.dedup import (
        jaccard_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    # the shingle frame feeds 4 subtrees (sigs + both co-join sides +
    # sizes); persist so one execution computes it once. sigs feeds 3
    # subtrees of its own (the sig facet + both candidate-join sides):
    # persisting it saves two recomputations of its groupBy shuffle
    sh = shingles(_docs(spark, sf_dir)).persist()
    sigs = minhash_signatures(sh).persist()
    pairs = jaccard_pairs(sh, pairs=minhash_candidate_pairs(sigs))
    sig_rows = sigs.select(
        F.lit("sig").alias("facet"),
        F.col("id").alias("a"),
        F.lit(None).cast("long").alias("b"),
        F.col("band").cast("long").alias("band"),
        "sig",
        F.lit(None).cast("long").alias("inter"),
        F.lit(None).cast("long").alias("union_n"),
        F.lit(None).cast("double").alias("jac"),
    )
    pair_rows = pairs.select(
        F.lit("pair").alias("facet"),
        "a", "b",
        F.lit(None).cast("long").alias("band"),
        F.lit(None).cast("string").alias("sig"),
        F.col("inter").cast("long").alias("inter"),
        F.col("union_n").cast("long").alias("union_n"),
        "jac",
    )
    return sig_rows.unionByName(pair_rows)


def q_ngram_jaccard(spark, sf_dir):
    """Exact 2-gram Jaccard over MANDATORY minhash candidates (the r01
    unfiltered shingle self-join was the non-scale shape; the candidate
    semi-join is the one that survives 10^9 docs)."""
    from rsyslog_spark.dataops.dedup import (
        jaccard_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sh = shingles(_docs(spark, sf_dir), k=2).persist()
    cand = minhash_candidate_pairs(minhash_signatures(sh))
    return jaccard_pairs(sh, pairs=cand, threshold=0.05)


def q_dedup_simhash(spark, sf_dir):
    """SimHash signatures + Hamming-blocked near-dup pairs in one
    driver row (consolidated facets 'sig'/'pair'). max_dist=3 -> nb=4
    blocks: the pigeonhole completeness bound holds (a fixed-nb=4
    blocking with max_dist=16 missed pairs whose diffs span all four
    blocks — ADVICE r01)."""
    from rsyslog_spark.dataops.dedup import hamming_pairs, shingles, simhash

    sim = simhash(shingles(_docs(spark, sf_dir)))
    sig_rows = sim.select(
        F.lit("sig").alias("facet"),
        F.col("id").alias("a"),
        F.lit(None).cast("long").alias("b"),
        "simhash",
        F.lit(None).cast("long").alias("dist"),
    )
    pair_rows = hamming_pairs(sim, max_dist=3).select(
        F.lit("pair").alias("facet"),
        "a", "b",
        F.lit(None).cast("string").alias("simhash"),
        F.col("dist").cast("long").alias("dist"),
    )
    return sig_rows.unionByName(pair_rows)


def q_embedding_topk(spark, sf_dir):
    """Exact brute-force top-k over the topic-structured corpus — the
    recall baseline the approximate facets are judged against."""
    from rsyslog_spark.dataops.similarity import topk_bruteforce

    e = _embs_structured(spark, sf_dir)
    return topk_bruteforce(e, e.filter(F.col("vec_id") < 10), k=5)


def q_embedding_neardup(spark, sf_dir):
    """Near-dup through seeded Rademacher sign-LSH buckets + exact
    cosine verify (replaces the r01 all-pairs join — that shape is now
    test-only). 16 tables x 8 bits: candidate volume ~16/256 of the
    pair space. Operating point threshold=0.9 — where the sign-LSH
    family actually works (measured recall ~0.997 vs brute force,
    PERF.md; at 0.4 recall is ~0.34 — that regime needs multi-probe
    and stays documented as a limitation, not showcased)."""
    from rsyslog_spark.dataops.similarity import neardup_lsh

    e = _embs(spark, sf_dir)
    # The sf embeddings are uniform-random (max pairwise cos ~0.55):
    # they contain NO near-duplicates at any honest threshold.  Plant
    # them deterministically from the corpus itself — a +0.05 twin per
    # vector (cos(v, v+c) ~0.99) with id+1000000 — derived identically
    # by the oracle, so the query exercises the family at its designed
    # operating point with non-trivial expected pairs.
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"),
    )
    twin = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + F.lit(0.05))
        .alias("embedding"),
    )
    return neardup_lsh(base.unionByName(twin), threshold=0.9,
                       n_tables=16, n_bits=8)


def q_embedding_lsh_topk(spark, sf_dir):
    """Sign-LSH approximate top-k at a MEANINGFUL operating point
    (r4): 8 independent tables x 6 bits (multi-table OR-banding) over
    the topic-structured corpus — measured recall 0.94 vs the brute
    facet (PERF.md; the r3 single-table demo on isotropic noise read
    0.02 because no blocked ANN can work there)."""
    from rsyslog_spark.dataops.similarity import topk_lsh

    e = _embs_structured(spark, sf_dir)
    return topk_lsh(e, e.filter(F.col("vec_id") < 10), k=5,
                    n_bits=6, n_tables=8)


def q_embedding_ivf_topk(spark, sf_dir):
    """IVF approximate top-k — the brief's second ANN scale path next
    to sign-LSH: 16 deterministic hash-chosen anchor centroids, exact
    int64 argmax assignment (corpus nprobe=1, queries nprobe=2), exact
    cosine + rank inside the probed inverted lists. The oracle
    recomputes the identical integer assignment."""
    import numpy as np

    from rsyslog_spark.dataops.similarity import ivf_anchor_ids, topk_ivf

    e = _embs_structured(spark, sf_dir)
    anchors = ivf_anchor_ids(e, 16)
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in e.filter(F.col("vec_id").isin(anchors)).collect()
    }
    cents = np.array(
        [
            np.floor(np.asarray(vecs[i], dtype=np.float64) * 1000 + 0.5)
            for i in anchors
        ],
        dtype=np.int64,
    )
    return topk_ivf(e, e.filter(F.col("vec_id") < 10), cents,
                    k=5, nprobe=4)


_SAMPLE_RATES = {"en": 0.5, "zh": 0.9, "fr": 0.25}   # default 1.0
_MIX_WEIGHTS = {"en": 0.5, "es": 2.5, "zh": 0.0}     # default 1.0


def q_sample_mix(spark, sf_dir):
    """Deterministic stratified sampling + weighted dataset mixing
    (dataops/sampling.py): per-language keep decisions from an exact
    integer hash gate, and per-language epoch factors materialized as
    copy rows (floor(w) + one Bernoulli unit -> expectation exactly w).
    Facet 'sample' = keep flags; facet 'mix' = (doc, copy) plan."""
    from rsyslog_spark.dataops.sampling import (
        stratified_sample,
        weighted_mix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    s = stratified_sample(docs, _SAMPLE_RATES, default_rate=1.0)
    m = weighted_mix(docs, _MIX_WEIGHTS, default_weight=1.0)
    sf = s.select(
        F.lit("sample").alias("facet"), "doc_id", "lang", "samp_keep",
        F.lit(None).cast("int").alias("copy"),
    )
    mf = m.select(
        F.lit("mix").alias("facet"), "doc_id", "lang",
        F.lit(None).cast("boolean").alias("samp_keep"), "copy",
    )
    return sf.unionByName(mf)


def q_queue_discard(spark, sf_dir):
    """queue.discardMark / queue.discardSeverity (qqueueChkDiscardMsg,
    runtime/queue.c:1605-1630) modeled per ingest-burst window — see
    rsyslog_spark/queue.py for the proof that the sequential enqueue
    recurrence collapses to one window expression. Two facets: 'row' =
    per-message keep/discard outcome, 'win' = the nearfull-discard
    counter (ctrNFDscrd, queue.c:1618) per burst window."""
    from rsyslog_spark.queue import queue_discard, queue_discard_stats

    p = _parsed(spark, sf_dir)
    # persist the 5-column flag projection: both facets fan out from it
    # (map-side partial agg under the 'win' facet breaks exchange-reuse
    # subtree equality, so without this the parse+window run twice)
    flagged = queue_discard(p, discard_mark=30, discard_severity=5).select(
        "conv_id", "turn_idx", "q_win", "q_pos", "q_keep"
    ).persist()
    rowf = flagged.select(
        F.lit("row").alias("facet"),
        "conv_id",
        "turn_idx",
        "q_win",
        "q_pos",
        "q_keep",
        F.lit(None).cast("long").alias("enqueued"),
        F.lit(None).cast("long").alias("discarded"),
    )
    winf = queue_discard_stats(flagged).select(
        F.lit("win").alias("facet"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        "q_win",
        F.lit(None).cast("long").alias("q_pos"),
        F.lit(None).cast("boolean").alias("q_keep"),
        "enqueued",
        "discarded",
    )
    return rowf.unionByName(winf)


def q_dup_clusters(spark, sf_dir):
    """Transitive duplicate clusters over verified MinHash near-dup
    pairs (dataops/cluster.py: alternating large-star/small-star CC,
    Kiveris et al. SoCC 2014). The iterative loop is non-SQL; its
    RESULT is — the oracle recomputes every label with a recursive
    reachability CTE, so the gate value-checks cluster ids, sizes and
    the canonical keep flag."""
    from rsyslog_spark.dataops.cluster import dup_clusters
    from rsyslog_spark.dataops.dedup import (
        jaccard_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sh = shingles(_docs(spark, sf_dir)).persist()
    pairs = jaccard_pairs(
        sh, pairs=minhash_candidate_pairs(minhash_signatures(sh)),
        threshold=0.05,
    )
    return dup_clusters(pairs)


def q_embedding_ann(spark, sf_dir):
    """All three similarity-search strategies in ONE driver row
    (consolidated r3 so new operators fit the driver's 50-query
    window): exact brute-force top-k (the baseline), sign-LSH
    bucketed top-k and IVF inverted-list top-k (the two approximate
    scale paths). One `method` facet column per strategy; each facet
    keeps its exact former shape (qid, nid, cos, rank)."""
    brute = q_embedding_topk(spark, sf_dir)
    lsh = q_embedding_lsh_topk(spark, sf_dir)
    ivf = q_embedding_ivf_topk(spark, sf_dir)
    return (
        brute.select(F.lit("brute").alias("method"), "*")
        .unionByName(lsh.select(F.lit("lsh").alias("method"), "*"))
        .unionByName(ivf.select(F.lit("ivf").alias("method"), "*"))
    )


def q_textstats(spark, sf_dir):
    """All five text-curation operators in one driver row
    (consolidated): facet='doc' — language-ID scores + prediction,
    quality features + composite score, whitespace/BPE-ish token
    counts (all chained Column appenders — one scan, zero shuffles),
    the min-k fingerprint (its own grouped plan) joined back per doc,
    plus the Gopher-style repetition signals (Rae et al. 2021 Table
    A1; one shuffle-free mapInPandas pass) joined per doc. facet=
    'vocab' (r4, closes the r3 verdict's driver-verification gap) —
    the corpus vocabulary/Zipf top-50: skew-safe two-level wordcount,
    O(1) agg state, TakeOrdered top-k with a dense deterministic
    rank."""
    from rsyslog_spark.dataops.textstats import (
        fingerprint,
        lang_id,
        quality_score,
        repetition_stats,
        token_counts,
        vocab_stats,
    )

    d = _docs(spark, sf_dir)
    flat = token_counts(quality_score(lang_id(d)))
    fp = fingerprint(d).withColumnRenamed("id", "doc_id")
    rep = repetition_stats(d).withColumnRenamed("id", "doc_id")
    doc = flat.join(fp, on="doc_id").join(rep, on="doc_id").select(
        F.lit("doc").alias("facet"),
        "doc_id",
        "score_en", "score_es", "score_fr", "score_de", "lang_pred",
        "n_tokens", "mean_tok_len", "punct_ratio", "stop_ratio", "quality",
        "ws_tokens", "bpe_tokens",
        "fp",
        "top_tok_frac", "top2gram_char_frac", "dup5gram_char_frac",
    )
    voc = vocab_stats(d, top_k=50).select(
        F.lit("vocab").alias("facet"),
        F.col("rank").cast("long").alias("vrank"),
        "token",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("doc_freq"),
    )
    return doc.unionByName(voc, allowMissingColumns=True)


def q_multimodal(spark, sf_dir):
    """Binary-payload metadata + Arrow feature extraction in one driver
    row (consolidated): both facets are per-doc over the same payload
    frame, joined per row."""
    from rsyslog_spark.dataops.multimodal import (
        extract_features,
        with_binary_payload,
    )

    payload = with_binary_payload(_docs(spark, sf_dir))
    meta = payload.select(
        "doc_id",
        F.col("media_meta.nbytes").alias("nbytes"),
        F.col("media_meta.digest").alias("digest"),
    )
    feats = extract_features(payload).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("features"),
                lambda x: F.format_string("%.6f", x.cast("double")),
            ),
        ).alias("features_csv"),
    )
    # r5 facet: REAL container-header image metadata (PNG IHDR / GIF /
    # BMP / JPEG SOF — multimodal.image_header_meta). Payload bytes are
    # built NATIVELY (hex strings -> unhex, zero UDF on the build side)
    # so the kernel only ever PARSES; doc_id%5==4 rows are corrupt and
    # must contain to ok=false nulls.
    from rsyslog_spark.dataops.multimodal import image_meta

    def _be(c, nbytes):
        return F.lpad(F.hex(c), nbytes * 2, "0")

    def _le(c, nbytes):
        h = F.lpad(F.hex(c), nbytes * 2, "0")
        return F.concat(
            *[F.substring(h, 2 * k + 1, 2) for k in reversed(range(nbytes))]
        )

    w = (1 + F.col("doc_id") % 500).cast("int")
    h = (1 + F.col("doc_id") % 300).cast("int")
    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"), _be(w, 4), _be(h, 4),
        F.lit("08060000000000"),
    )
    gif = F.concat(
        F.lit("474946383961"), _le(w, 2), _le(h, 2), F.lit("F70000")
    )
    bmp = F.concat(
        F.lit("424D000000000000000000000000"), F.lit("28000000"),
        _le(w, 4), _le(h, 4), F.lit("01001800"),
    )
    jpeg = F.concat(
        # SOI + APP0(len 16: JFIF\0, v1.1, units 0, density 0x0, thumb 0x0)
        F.lit("FFD8FFE000104A46494600010100000000000000"),
        # SOF0(len 17): precision 8, height, width, 3 components
        F.lit("FFC0001108"), _be(h, 2), _be(w, 2),
        F.lit("03000000000000000000"),
    )
    m5 = F.col("doc_id") % 5
    img_payload = (
        F.when(m5 == 0, F.unhex(png))
        .when(m5 == 1, F.unhex(gif))
        .when(m5 == 2, F.unhex(bmp))
        .when(m5 == 3, F.unhex(jpeg))
        .otherwise(F.encode(F.lit("corrupt"), "UTF-8"))
    )
    img = image_meta(
        payload.withColumn("img_payload", img_payload),
        payload_col="img_payload",
    ).select(
        F.col("id").alias("doc_id"),
        F.col("format").alias("img_format"),
        F.col("width").alias("img_w"),
        F.col("height").alias("img_h"),
        F.col("channels").alias("img_ch"),
        F.col("ok").alias("img_ok"),
    )
    return meta.join(feats, on="doc_id").join(img, on="doc_id")


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
        "lookup_array": q_lookup_array,
        "dyn_inc_counters": q_dyn_inc_counters,
        "mm_count_app_sev": q_mm_count_app_sev,
        "mm_sequence_conv": q_mm_sequence_conv,
        "seq_summary": q_seq_summary,
        "repeat_runs_role": q_repeat_runs_role,
        "sampling_gates": q_sampling_gates,
        "mm_jsonparse": q_mm_jsonparse,
        "mm_fields": q_mm_fields,
        "mm_pstrucdata": q_mm_pstrucdata,
        "rs_functions": q_rs_functions,
        "impstats": q_impstats,
        "config_text_routing": q_config_text_routing,
        "foreach_vars": q_foreach_vars,
        "call_indirect": q_call_indirect,
        "config_text_calc": q_config_text_calc,
        "pm_lastmsg": q_pm_lastmsg,
        "dyn_inc_cycles": q_dyn_inc_cycles,
        "parse_uncompress": q_parse_uncompress,
        "multiline": q_multiline,
        "sys_time_props": q_sys_time_props,
        "immark_rows": q_immark_rows,
        "failover": q_failover,
        "bre_propfilt": q_bre_propfilt,
        "octet_framing": q_octet_framing,
        "queue_discard": q_queue_discard,
        "template_options": q_template_options,
        "mm_rewrite": q_mm_rewrite,
        "dedup_exact": q_dedup_exact,
        "decontaminate": q_decontaminate,
        "dedup_minhash": q_dedup_minhash,
        "ngram_jaccard": q_ngram_jaccard,
        "dup_clusters": q_dup_clusters,
        "sample_mix": q_sample_mix,
        "dedup_simhash": q_dedup_simhash,
        "embedding_ann": q_embedding_ann,
        "embedding_neardup": q_embedding_neardup,
        "textstats": q_textstats,
        "multimodal": q_multimodal,
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
        "syslogfacility, syslogseverity, timereported, "
        # pmrfc3164-instance facets (closed-form synthetic line):
        # slashes-permitted hostname, force-colon TAG ('-' + the
        # pre-TAG-SP restore on odd rows), hour-position year ts
        "'host/' || CAST(i AS VARCHAR) AS p3_host, "
        "CASE WHEN i % 2 = 0 THEN 'tag:' ELSE '-' END AS p3_tag, "
        "CASE WHEN i % 2 = 0 THEN ' m' ELSE ' tagnc m' END AS p3_msg, "
        "make_timestamp(2000 + i % 100, 3, 10, 1, 0, i % 6) AS p3_ts "
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
    o["lookup_array"] = with_parsed_oracle(
        "SELECT i, CASE i % 10 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' "
        "WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning' "
        "WHEN 5 THEN 'notice' WHEN 6 THEN 'info' WHEN 7 THEN 'debug' "
        "ELSE '?' END AS sev_name FROM t0"
    )
    o["asof_sev_bucket"] = with_parsed_oracle(
        "SELECT i, CAST(i % 1500 AS BIGINT) AS k, "
        "CASE WHEN i % 1500 >= 1000 THEN 'extreme' "
        "WHEN i % 1500 >= 500 THEN 'high' "
        "WHEN i % 1500 >= 100 THEN 'mid' ELSE 'low' END AS bucket FROM t0"
    )
    o["dyn_inc_counters"] = with_parsed_oracle(
        "SELECT 'progs' AS name, programname AS key, count(*) AS count "
        "FROM p WHERE parse_success GROUP BY programname "
        "UNION ALL "
        'SELECT name, key, "count" FROM ('
        'SELECT name, key, "count", row_number() OVER '
        '(ORDER BY "count" DESC, key) AS rn FROM ('
        "SELECT 'hosts' AS name, hostname AS key, count(*) AS \"count\" "
        "FROM p WHERE parse_success GROUP BY hostname)) WHERE rn <= 5 "
        "UNION ALL "
        "SELECT 'hosts', 'ops_overflow', CAST(sum(\"count\") AS BIGINT) "
        "FROM (SELECT \"count\", row_number() OVER (ORDER BY \"count\" "
        "DESC, key) AS rn FROM (SELECT hostname AS key, count(*) AS "
        '"count" FROM p WHERE parse_success GROUP BY hostname)) '
        # HAVING guard: with <= 5 distinct hostnames the ungrouped SUM
        # would still emit one NULL row while _apply_caps emits none —
        # both sides must agree the overflow row is absent
        "WHERE rn > 5 HAVING count(*) > 0"
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
    o["sampling_gates"] = with_parsed_oracle(
        "SELECT conv_id, turn_idx, "
        "row_number() OVER (PARTITION BY conv_id, "
        "date_trunc('minute', ts) ORDER BY turn_idx) <= 5 AS rl_keep, "
        "CASE WHEN syslogseverity < 4 THEN TRUE ELSE "
        "sum(CASE WHEN syslogseverity >= 4 THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY conv_id, date_trunc('minute', ts) ORDER BY turn_idx) "
        "<= 3 END AS rl_sev_keep, "
        "(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) % 3) "
        "= 0 AS nth_keep, "
        "row_number() OVER (PARTITION BY conv_id, "
        "CAST(floor(epoch(ts) / 600) AS BIGINT) ORDER BY turn_idx) = 1 "
        "AS once_keep FROM p"
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
        "CAST(len(string_split(msg, ':')) AS BIGINT) AS nf, "
        "CASE WHEN msg LIKE ' %' THEN substr(msg, 2) ELSE msg END "
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
        "'\"' || programname || '\"' AS wrapped, "
        "CAST(CASE WHEN i % 10 <= 7 THEN epoch(timereported) ELSE 0 END "
        "AS BIGINT) AS pt, "
        "(i % 10 <= 7) AS ist, "
        "strftime(make_timestamp((i * 1000 + 7) * 1000000), '%b') || ' ' || "
        "lpad(CAST(day(make_timestamp((i * 1000 + 7) * 1000000)) "
        "AS VARCHAR), 2, ' ') || ' ' || "
        "strftime(make_timestamp((i * 1000 + 7) * 1000000), '%H:%M:%S') "
        "AS ft64, "
        "strftime(make_timestamp((i * 1000 + 7) * 1000000), "
        "'%Y-%m-%dT%H:%M:%S') || '+00:00' AS ft39, "
        "CAST(length(msg) AS INT) AS sl, "
        "replace(msg, 'the', 'THE') AS rep, "
        "'\"' || replace(msg, '\"', '#') || '\"' AS w3, "
        "CAST((i * 9973) % 4294967296 AS BIGINT) AS ipn, "
        "CAST(-1 AS BIGINT) AS ipbad "
        "FROM p WHERE parse_success"
    )
    o["config_text_routing"] = with_parsed_oracle(
        "SELECT 'parse_errors' AS sink, count(*) AS n FROM p "
        "WHERE NOT parse_success "
        "UNION ALL SELECT 'kern_crit', count(*) FROM p WHERE parse_success "
        "AND syslogfacility IN (0, 1) AND syslogseverity <= 2 "
        "UNION ALL SELECT 'apps', count(*) FROM p WHERE parse_success "
        "AND programname IN ('chat', 'kernelish') "
        "UNION ALL SELECT 'lazy_low', count(*) FROM p WHERE parse_success "
        "AND msg LIKE '%lazy%' AND syslogseverity >= 4 "
        "UNION ALL SELECT 'rest', count(*) FROM p WHERE parse_success"
    )
    _sevname = (
        "CASE i % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' "
        "WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning' "
        "WHEN 5 THEN 'notice' WHEN 6 THEN 'info' ELSE 'debug' END"
    )
    o["foreach_vars"] = with_parsed_oracle(
        "SELECT i, k, v, k || '=' || v AS line FROM ("
        "SELECT i, 'msgnum' AS k, CAST(i AS VARCHAR) AS v FROM p "
        "WHERE parse_success AND msg LIKE '{%' "
        f"UNION ALL SELECT i, 'lvl', {_sevname} FROM p "
        "WHERE parse_success AND msg LIKE '{%')"
    )
    # sev/4: 0 for sev<=3 ('sev0', queued: stop/set isolated),
    # 1 for sev>=4 ('sev1', inline: stop propagates to 'tail')
    _sev = "(CASE WHEN i % 10 <= 7 THEN i % 8 ELSE 5 END)"
    _fac = "(CASE WHEN i % 10 <= 7 THEN i % 24 ELSE 1 END)"
    o["call_indirect"] = with_parsed_oracle(
        "SELECT 'urgent' AS sink, count(*) AS n FROM p "
        f"WHERE parse_success AND {_sev} <= 3 "
        "UNION ALL SELECT 'routine', count(*) FROM p "
        f"WHERE parse_success AND {_sev} > 3 "
        "UNION ALL SELECT 'tail', count(*) FROM p "
        f"WHERE parse_success AND {_sev} <= 3 "
        "UNION ALL SELECT 'vars_pre', count(*) FROM p WHERE parse_success"
    )
    o["config_text_calc"] = with_parsed_oracle(
        "SELECT i, "
        f"CAST(({_sev} * 8 + {_fac}) % 100 AS BIGINT) AS code, "
        "coalesce(list_extract(string_split(msg, ':'), 2), "
        "'***FIELD NOT FOUND***') AS fld, "
        f"lower(to_hex({_sev} * 256 + 7)) AS hex, "
        f"CAST(2 - {_sev} AS BIGINT) AS neg, "
        "CASE WHEN msg LIKE '{%' THEN 0 ELSE 1 END AS e1, "
        f"CASE WHEN msg LIKE '{{%' THEN {_sevname} ELSE '' END AS lvl, "
        "CAST(0 AS BIGINT) AS pt, 1 AS e2, "
        f"CAST(({_sev} * 8 + {_fac}) % 100 AS VARCHAR) || '-' || "
        f"CAST({_sev} AS VARCHAR) AS sum_s "
        "FROM p WHERE parse_success"
    )
    o["pm_lastmsg"] = (
        "SELECT event_id AS i, "
        "'last message repeated ' || CAST(event_id % 9 AS VARCHAR) || "
        "' times' AS msg, '' AS syslogtag, "
        "CAST(0 AS INT) AS protocol_version, '' AS hostname "
        "FROM events WHERE event_id % 50 = 0"
    )
    _W600 = "CAST(floor(epoch(ts) / 600) AS BIGINT)"
    o["dyn_inc_cycles"] = with_parsed_oracle(
        f", base AS (SELECT role AS key, {_W600} AS w, "
        "count(*) AS n FROM t0 WHERE i % 3000 < 600 GROUP BY 1, 2), "
        "gaps AS (SELECT key, w, n, CASE WHEN w - lag(w) OVER "
        "(PARTITION BY key ORDER BY w) > 2 THEN 1 ELSE 0 END AS g "
        "FROM base), "
        "seg AS (SELECT key, w, n, sum(g) OVER "
        "(PARTITION BY key ORDER BY w) AS s FROM gaps) "
        f"SELECT 'roles' AS name, role AS key, "
        f"make_timestamp({_W600} * 600 * 1000000) AS window_start, "
        f"count(*) AS count FROM t0 GROUP BY role, {_W600} "
        "UNION ALL SELECT 'ttl', key, "
        "make_timestamp(w * 600 * 1000000), "
        "CAST(sum(n) OVER (PARTITION BY key, s ORDER BY w) AS BIGINT) "
        "FROM seg "
        "UNION ALL SELECT 'cum', key, "
        "make_timestamp(w * 600 * 1000000), "
        "CAST(sum(n) OVER (PARTITION BY key ORDER BY w) AS BIGINT) "
        "FROM base"
    )
    o["parse_uncompress"] = with_parsed_oracle(
        "SELECT i, parser, msg FROM p WHERE i % 97 <> 0"
    )
    o["multiline"] = with_parsed_oracle(
        ", ml AS (SELECT conv_id, turn_idx, text, "
        "CAST(sum(CASE WHEN text LIKE '<%' THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS msg_seq "
        "FROM t0) "
        "SELECT conv_id, msg_seq, min(turn_idx) AS first_turn_idx, "
        "count(*) AS n_lines, "
        "string_agg(text, chr(10) ORDER BY turn_idx) AS msg_text "
        "FROM ml GROUP BY conv_id, msg_seq"
    )
    o["immark_rows"] = with_parsed_oracle(
        ", span AS (SELECT CAST(floor(epoch(min(ts)) / 600) AS BIGINT) + 1 "
        "AS klo, CAST(floor(epoch(max(ts)) / 600) AS BIGINT) AS khi "
        "FROM t0) "
        "SELECT '--mark--' AS conv_id, "
        "CAST(row_number() OVER (ORDER BY k) - 1 AS INT) AS turn_idx, "
        "'system' AS role, '-- MARK --' AS text, '' AS tool, "
        "make_timestamp(k * 600 * 1000000) AS ts "
        "FROM span, unnest(generate_series(span.klo, span.khi)) AS tk(k)"
    )
    # severity gate: sev >= 4 limited (burst 3 per conv per minute,
    # ranked among limited rows only); sev < 4 always kept
    o["failover"] = with_parsed_oracle(
        "SELECT 'alt_crit' AS sink, count(*) AS n FROM p "
        "WHERE syslogseverity <= 3 "
        "UNION ALL SELECT 'err_crit', count(*) FROM p "
        "WHERE syslogseverity <= 3 "
        "UNION ALL SELECT 'pri_all', count(*) FROM p"
    )
    o["bre_propfilt"] = with_parsed_oracle(
        "SELECT i, "
        "regexp_matches(msg, '(lazy|msgnum:1[0-9]{2})') AS m_bre, "
        "regexp_matches(msg, '\\(parens\\) q\\+') AS m_lit "
        "FROM p WHERE parse_success"
    )
    o["octet_framing"] = with_parsed_oracle(
        "SELECT conv_id, CAST(row_number() OVER (PARTITION BY conv_id "
        "ORDER BY turn_idx) - 1 AS BIGINT) AS frame_idx, text, "
        "'counted' AS mode FROM t0 "
        "UNION ALL SELECT conv_id, CAST(row_number() OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) - 1 AS BIGINT), text, "
        "'stuffed' FROM t0"
    )
    _QROW = (
        "(SELECT conv_id, turn_idx, "
        "CAST(floor(epoch(ts) / 60) AS BIGINT) AS q_win, "
        "CAST(row_number() OVER (PARTITION BY "
        "CAST(floor(epoch(ts) / 60) AS BIGINT) "
        "ORDER BY ts, conv_id, turn_idx) AS BIGINT) AS q_pos, "
        "syslogseverity AS sev FROM p) rowf"
    )
    o["queue_discard"] = with_parsed_oracle(
        "SELECT 'row' AS facet, conv_id, turn_idx, q_win, q_pos, "
        "(sev < 5 OR q_pos <= 30) AS q_keep, "
        "CAST(NULL AS BIGINT) AS enqueued, "
        "CAST(NULL AS BIGINT) AS discarded "
        f"FROM {_QROW} "
        "UNION ALL SELECT 'win', CAST(NULL AS VARCHAR), "
        "CAST(NULL AS INTEGER), q_win, CAST(NULL AS BIGINT), "
        "CAST(NULL AS BOOLEAN), count(*), "
        "sum(CASE WHEN NOT (sev < 5 OR q_pos <= 30) THEN 1 ELSE 0 END) "
        f"FROM {_QROW} GROUP BY q_win"
    )
    o["sys_time_props"] = with_parsed_oracle(
        "SELECT i, strftime(ts, '%Y-%m-%d') || ' ' || "
        "strftime(ts, '%H:%M') || ' h' || "
        "lpad(CAST(CAST(floor(minute(ts) / 30.0) AS INT) AS VARCHAR), 2, '0') || "
        "' q' || "
        "lpad(CAST(CAST(floor(minute(ts) / 15.0) AS INT) AS VARCHAR), 2, '0') || "
        "' w' || CAST(dayofweek(ts) AS VARCHAR) || "
        "' u' || CAST(CAST(epoch(ts) AS BIGINT) AS VARCHAR) AS line "
        "FROM p WHERE parse_success"
    )
    _JESC = (
        "replace(replace(replace(replace(replace({x}, '\\', '\\\\'), "
        "'\"', '\\\"'), chr(10), '\\n'), chr(13), '\\r'), chr(9), '\\t')"
    )
    o["template_options"] = with_parsed_oracle(
        "SELECT i, "
        "coalesce(list_extract(string_split(msg, ':'), 2), "
        "'**FIELD NOT FOUND**') AS f2, "
        "upper(substr(msg, 2, 7)) AS sub, "
        "'\"' || replace(hostname, '\"', '\"\"') || '\"' AS hostcsv, "
        "coalesce(nullif(regexp_extract(msg, 'msgnum.([0-9]+)', 1), ''), "
        "'**NO MATCH**') AS rex, "
        + _JESC.format(x="regexp_replace(msg, ' +', ' ', 'g')")
        + " AS jmsg FROM p WHERE parse_success"
    )
    _k2 = "((i * 2654435761) % 4294967296)"
    _quad2 = (
        f"CAST({_k2} // 16777216 % 256 AS VARCHAR) || '.' || "
        f"CAST({_k2} // 65536 % 256 AS VARCHAR) || '.' || "
        f"CAST({_k2} // 256 % 256 AS VARCHAR) || '.' || "
        f"CAST({_k2} % 256 AS VARCHAR)"
    )
    # rulebase facet: rule NUM's anchored regex, first-match CASE; the
    # catch-all rule=:%any:rest% always matches, so rb_* are NULL
    # (absent keys) exactly when NUM does not match
    _rb_rx = r"'^ msgnum:(\d+) ([^ ]+) ([\s\S]*)$'"
    o["mm_rewrite"] = with_parsed_oracle(
        "SELECT i, regexp_replace("
        f"'src=' || {_quad2} || ' dst=10.1.2.3 ' || msg, "
        r"'\b(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})\b', "
        r"'\1.\2.0.0', 'g') AS anon_msg, "
        "regexp_extract(msg, 'msgnum:([0-9]+)', 1) AS msgnum, "
        "regexp_extract(msg, '^ ?([a-z]+)', 1) AS first_word, "
        f"CASE WHEN regexp_matches(msg, {_rb_rx}) "
        f"THEN regexp_extract(msg, {_rb_rx}, 1) END AS rb_num, "
        f"CASE WHEN regexp_matches(msg, {_rb_rx}) "
        f"THEN regexp_extract(msg, {_rb_rx}, 2) END AS rb_w1, "
        f"CASE WHEN regexp_matches(msg, {_rb_rx}) "
        "THEN 'rb' END AS rb_src, "
        # mmaudit facets: closed-form audit line; auditid drops its
        # first char (the C's sizeof(" audit(") off-by-one)
        "CASE WHEN i % 5 <> 0 "
        "THEN substr(CAST(i AS VARCHAR) || '.5:7', 2) END AS au_id, "
        "CASE WHEN i % 5 <> 0 THEN CAST(i % 3 AS VARCHAR) END AS au_type, "
        "CASE WHEN i % 5 <> 0 THEN CAST(i AS VARCHAR) END AS au_seq, "
        "CASE WHEN i % 5 <> 0 THEN 'x y' END AS au_op, "
        # mmtaghostname facets: tag replace + programname re-derivation
        # (stops at '[') + forced localhostname
        "'relay[7]:x' AS th_tag, 'relay' AS th_prog, "
        "'frontAPP' AS th_host, "
        # mmrfc5424addhmac facet: digest masked to 'H' (no binary
        # sha256 in DuckDB; byte-exact digests in pytest)
        "CASE WHEN protocol_version = 1 THEN "
        "'[exampleSDID@32473 k=\"v\"][hm@1 hash=\"H\"]' "
        "ELSE structured_data END AS hm_shape, "
        # mmgrok facets: unanchored search; WORD = \\b\\w+\\b
        "CASE WHEN regexp_matches(msg, 'msgnum:([0-9]+) ([A-Za-z0-9_]+)')"
        " THEN regexp_extract(msg, 'msgnum:([0-9]+) ([A-Za-z0-9_]+)', 1)"
        " END AS gk_num, "
        "CASE WHEN regexp_matches(msg, 'msgnum:([0-9]+) ([A-Za-z0-9_]+)')"
        " THEN regexp_extract(msg, 'msgnum:([0-9]+) ([A-Za-z0-9_]+)', 2)"
        " END AS gk_word, "
        # liblognorm new-type facets: closed-form device line
        "printf('%02x:%02x:%02x:00:1b:63', i % 256, (i * 7) % 256, "
        "(i * 13) % 256) AS ln_mac, "
        "CAST(i AS VARCHAR) || '.' || CAST(i % 10 AS VARCHAR) AS ln_t, "
        "'::1' AS ln_a6, "
        "'a=' || CAST(i AS VARCHAR) || ' b=2' AS ln_kv, "
        # second-batch liblognorm facets: closed-form session line
        "'[' || CAST(i + 10000 AS VARCHAR) || '.000042]' AS ln_kts, "
        "CAST(i % 100 AS VARCHAR) || ':05:09' AS ln_dur, "
        "printf('0x%x', i) AS ln_hex, "
        "lpad(CAST(i % 24 AS VARCHAR), 2, '0') || ':30:59' AS ln_t24, "
        "'IN=eth0 OUT= SRC=10.0.0.' || CAST(i % 256 AS VARCHAR) "
        "AS ln_ipt, "
        "'w' || CAST(i AS VARCHAR) || ' x' AS ln_note, "
        # mmsnmptrapd facets: i%3==0 rows carry the synthetic
        # snmptrapd/<sev>/origin-<i>: tag; TAG -> 'snmptrapd:',
        # hostname from the tag's host component, severity mapped only
        # for the 'warning' rows (the 'bogus' name misses the map and
        # leaves severity/pri untouched, mmsnmptrapd.c:258-263)
        "CASE WHEN i % 3 = 0 THEN 'snmptrapd:' ELSE syslogtag END "
        "AS snmp_tag, "
        "CASE WHEN i % 3 = 0 THEN 'origin-' || CAST(i AS VARCHAR) "
        "ELSE hostname END AS snmp_host, "
        "CASE WHEN i % 3 = 0 AND i % 2 = 0 THEN 2 "
        "ELSE syslogseverity END AS snmp_sev, "
        "CASE WHEN i % 3 = 0 AND i % 2 = 0 THEN syslogfacility * 8 + 2 "
        "ELSE pri END AS snmp_pri, "
        # mmexternal facets: classes 0-7 carry msgnum:<digits> in MSG
        # (class 8's JSON has '\"msgnum\":' — quote before the colon,
        # no match -> '{}' no-update)
        "CASE WHEN i % 10 <= 7 THEN CAST(i AS VARCHAR) END AS ext_mn, "
        "CASE WHEN i % 10 <= 7 THEN 'msgmod' END AS ext_prog, "
        "CASE WHEN i % 10 <= 7 THEN 'X' || CAST(i AS VARCHAR) "
        "ELSE msgid END AS ext_msgid, "
        # omprog facet: the program rejects msgnum ≡ 3 (mod 7) lines
        "CASE WHEN i % 10 <= 7 AND i % 7 = 3 THEN 'error:Error: div7' "
        "ELSE 'ok' END AS prog_status, "
        # mmdblookup facets: i%4==3 misses the DB, 0 -> 192.168/16,
        # else 10/8 (committed fixture tools/fixtures/geo.mmdb)
        "CASE WHEN i % 4 = 3 THEN NULL WHEN i % 4 = 0 THEN 'PrivNet' "
        "ELSE 'TenNet' END AS dbl_city, "
        "CASE WHEN i % 4 = 3 THEN NULL WHEN i % 4 = 0 THEN 'PN' "
        "ELSE 'TN' END AS dbl_cc "
        "FROM p WHERE parse_success"
    )
    # --- dataops oracles ---------------------------------------------------
    _SH = (
        "toks AS (SELECT doc_id AS id, string_split(text, ' ') AS w "
        "FROM documents), "
        "sh AS (SELECT DISTINCT id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
        "AS sh FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i))"
    )
    # minhash lanes = 8-hex slices of md5(sh) and md5('x:'||sh) — the
    # single-digest scheme (2 md5/shingle), mirrored from dedup.py
    _LANES = (
        "lanes AS (SELECT id, "
        "min(substr(md5(sh), 1, 8)) AS l0, "
        "min(substr(md5(sh), 9, 8)) AS l1, "
        "min(substr(md5(sh), 17, 8)) AS l2, "
        "min(substr(md5(sh), 25, 8)) AS l3, "
        "min(substr(md5('x:' || sh), 1, 8)) AS l4, "
        "min(substr(md5('x:' || sh), 9, 8)) AS l5, "
        "min(substr(md5('x:' || sh), 17, 8)) AS l6, "
        "min(substr(md5('x:' || sh), 25, 8)) AS l7 "
        "FROM sh GROUP BY id)"
    )
    _SIGS = (
        _LANES + ", "
        "sigs AS (SELECT id, CAST(b AS INT) AS band, "
        "CASE b WHEN 0 THEN l0 || l1 WHEN 1 THEN l2 || l3 "
        "WHEN 2 THEN l4 || l5 ELSE l6 || l7 END AS sig "
        "FROM lanes, unnest(generate_series(0, 3)) AS bb(b))"
    )
    _CAND = (
        "cand AS (SELECT DISTINCT l.id AS a, r.id AS b FROM sigs l "
        "JOIN sigs r ON l.band = r.band AND l.sig = r.sig AND l.id < r.id)"
    )
    _SIZES = "sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id)"
    _CO = (
        "co AS (SELECT x.id AS a, y.id AS b, count(*) AS inter FROM sh x "
        "JOIN sh y ON x.sh = y.sh AND x.id < y.id GROUP BY 1, 2)"
    )
    _JAC = (
        "jac AS (SELECT co.a, co.b, co.inter, "
        "sa.sz + sb.sz - co.inter AS union_n, "
        "round(co.inter / (sa.sz + sb.sz - co.inter), 4) AS jac "
        "FROM co JOIN sizes sa ON co.a = sa.id "
        "JOIN sizes sb ON co.b = sb.id)"
    )
    o["dedup_exact"] = (
        "SELECT md5(text) AS content_hash, count(*) AS n, "
        "min(doc_id) AS keep_id FROM documents GROUP BY 1"
    )
    o["decontaminate"] = (
        "WITH toks AS (SELECT doc_id AS id, string_split(text, ' ') AS w "
        "FROM documents), "
        "g AS (SELECT DISTINCT id, array_to_string(w[i:i+12], ' ') AS g "
        "FROM toks, unnest(generate_series(1, len(w) - 12)) AS t(i)), "
        "ev AS (SELECT DISTINCT g FROM g WHERE id % 10 = 7), "
        "cnt AS (SELECT g.id, count(*) AS n_grams, count(ev.g) AS n_hit "
        "FROM g LEFT JOIN ev ON g.g = ev.g GROUP BY g.id) "
        "SELECT d.doc_id AS id, coalesce(cnt.n_grams, 0) AS n_grams, "
        "coalesce(cnt.n_hit, 0) AS n_hit, "
        "CASE WHEN coalesce(cnt.n_grams, 0) > 0 "
        "THEN round(cnt.n_hit / cnt.n_grams, 6) ELSE 0.0 END AS frac, "
        "CASE WHEN coalesce(cnt.n_grams, 0) > 0 "
        "THEN round(cnt.n_hit / cnt.n_grams, 6) >= 0.8 "
        "ELSE FALSE END AS contaminated "
        "FROM documents d LEFT JOIN cnt ON cnt.id = d.doc_id"
    )
    o["dedup_minhash"] = (
        f"WITH {_SH}, {_SIGS}, {_CAND}, {_SIZES}, {_CO}, {_JAC} "
        "SELECT 'sig' AS facet, id AS a, CAST(NULL AS BIGINT) AS b, "
        "CAST(band AS BIGINT) AS band, sig, "
        "CAST(NULL AS BIGINT) AS inter, CAST(NULL AS BIGINT) AS union_n, "
        "CAST(NULL AS DOUBLE) AS jac FROM sigs "
        "UNION ALL SELECT 'pair', jac.a, jac.b, "
        "CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), "
        "CAST(jac.inter AS BIGINT), CAST(jac.union_n AS BIGINT), jac.jac "
        "FROM jac JOIN cand ON jac.a = cand.a AND jac.b = cand.b"
    )
    _SH2 = (
        "toks AS (SELECT doc_id AS id, string_split(text, ' ') AS w "
        "FROM documents), "
        "sh AS (SELECT DISTINCT id, w[i] || ' ' || w[i+1] "
        "AS sh FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i))"
    )
    o["ngram_jaccard"] = (
        f"WITH {_SH2}, {_SIGS}, {_CAND}, {_SIZES}, {_CO}, {_JAC} "
        "SELECT jac.* FROM jac JOIN cand ON jac.a = cand.a "
        "AND jac.b = cand.b WHERE jac.jac >= 0.05"
    )
    # sample_mix: same integer md5 hash gate as sampling.py — the
    # thresholds are the IDENTICAL python-computed constants
    from rsyslog_spark.dataops.sampling import threshold as _thr

    def _h(salt):
        return (
            f"CAST(concat('0x', substr(md5('{salt}:' || "
            "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
        )

    def _case(vals: dict, default, f):
        cases = " ".join(
            f"WHEN '{k}' THEN {f(v)}" for k, v in sorted(vals.items())
        )
        return f"(CASE lang {cases} ELSE {f(default)} END)"

    _samp_thr = _case(_SAMPLE_RATES, 1.0, lambda r: _thr(r))
    _mix_whole = _case(_MIX_WEIGHTS, 1.0, lambda w: int(w))
    _mix_frac = _case(_MIX_WEIGHTS, 1.0, lambda w: _thr(w - int(w)))
    o["sample_mix"] = (
        "SELECT 'sample' AS facet, doc_id, lang, "
        f"{_h('sample')} < {_samp_thr} AS samp_keep, "
        "CAST(NULL AS INTEGER) AS copy FROM documents "
        "UNION ALL SELECT 'mix', doc_id, lang, "
        "CAST(NULL AS BOOLEAN), CAST(t.i AS INTEGER) FROM ("
        f"SELECT doc_id, lang, {_mix_whole} + "
        f"(CASE WHEN {_h('mix')} < {_mix_frac} THEN 1 ELSE 0 END) AS n "
        "FROM documents) d, unnest(generate_series(0, d.n - 1)) t(i)"
    )
    # dup_clusters: same k=3 minhash pair chain as dedup_minhash, then
    # component labels via recursive reachability (min reachable id) —
    # the closed-form twin of the Spark side's large/small-star loop
    o["dup_clusters"] = (
        f"WITH RECURSIVE {_SH}, {_SIGS}, {_CAND}, {_SIZES}, {_CO}, "
        f"{_JAC}, "
        "px AS (SELECT jac.a, jac.b FROM jac JOIN cand "
        "ON jac.a = cand.a AND jac.b = cand.b WHERE jac.jac >= 0.05), "
        "edges AS (SELECT a AS u, b AS v FROM px "
        "UNION ALL SELECT b, a FROM px), "
        "reach AS (SELECT u AS v, u AS r FROM edges "
        "UNION SELECT e.v, reach.r FROM edges e "
        "JOIN reach ON e.u = reach.v), "
        "comp AS (SELECT v AS doc_id, min(r) AS cluster_id "
        "FROM reach GROUP BY v), "
        "sz AS (SELECT cluster_id, count(*) AS csize FROM comp "
        "GROUP BY cluster_id) "
        "SELECT c.doc_id, c.cluster_id, sz.csize, "
        "c.doc_id = c.cluster_id AS keep "
        "FROM comp c JOIN sz ON c.cluster_id = sz.cluster_id"
    )
    _BITS = (
        "bits AS (SELECT id, k, sum(2 * (((instr('0123456789abcdef', "
        "substr(md5(sh), (k // 4) + 1, 1)) - 1) >> (3 - (k % 4))) & 1) - 1) "
        "AS s FROM sh, unnest(generate_series(0, 31)) AS tk(k) "
        "GROUP BY id, k)"
    )
    _SIM = (
        "sim AS (SELECT id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' "
        "END, '' ORDER BY k) AS simhash FROM bits GROUP BY id)"
    )
    o["dedup_simhash"] = (
        f"WITH {_SH}, {_BITS}, {_SIM}, "
        "blocks AS (SELECT id, simhash, blk, "
        "substr(simhash, blk * 8 + 1, 8) AS piece FROM sim, "
        "unnest(generate_series(0, 3)) AS tb(blk)), "
        "candh AS (SELECT DISTINCT l.id AS a, r.id AS b, "
        "l.simhash AS ha, r.simhash AS hb FROM blocks l JOIN blocks r "
        "ON l.blk = r.blk AND l.piece = r.piece AND l.id < r.id) "
        "SELECT 'sig' AS facet, id AS a, CAST(NULL AS BIGINT) AS b, "
        "simhash, CAST(NULL AS BIGINT) AS dist FROM sim "
        "UNION ALL SELECT 'pair', a, b, CAST(NULL AS VARCHAR), "
        "CAST(dist AS BIGINT) FROM (SELECT a, b, CAST(list_sum("
        "list_transform(generate_series(1, 32), k -> CASE WHEN "
        "substr(ha, k, 1) <> substr(hb, k, 1) THEN 1 ELSE 0 END)) AS INT) "
        "AS dist FROM candh) WHERE dist <= 3"
    )
    # topic-structured corpus for the ANN top-k facets — mirrors
    # _embs_structured: +4.0 on dims d (0-based) with d%16 ==
    # vec_id%16 (DuckDB lists are 1-based, hence d-1); float->double
    # widening then +4.0 in double is IEEE-identical across engines
    _ES = (
        "e AS (SELECT vec_id, list_transform(generate_series(1, 64), "
        "d -> CAST(embedding[d] AS DOUBLE) + CASE WHEN (d - 1) % 16 = "
        "vec_id % 16 THEN 4.0 ELSE 0.0 END) AS v FROM embeddings), "
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)"
    )
    _sql_brute = (
        f"WITH {_ES} SELECT qid, nid, cos, rank FROM ("
        "SELECT q.vec_id AS qid, c.vec_id AS nid, "
        "round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        "round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) DESC, "
        "c.vec_id) AS rank "
        "FROM n q JOIN n c ON q.vec_id <> c.vec_id WHERE q.vec_id < 10) "
        "WHERE rank <= 5"
    )
    # Rademacher hyperplane CTEs (mirror similarity.rademacher_plane:
    # bit d of md5('h<t>:<j>') via the simhash nibble convention;
    # projection over x1000-quantized integer vectors = EXACT int math,
    # so buckets are byte-identical across engines)
    _QV = (
        "qv AS (SELECT vec_id, list_transform(v, x -> "
        "CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q FROM e)"
    )

    def _hyper(name, n_tables, n_bits):
        return (
            f"{name} AS (SELECT t, j, d, "
            "(((instr('0123456789abcdef', substr(md5('h' || "
            "CAST(t AS VARCHAR) || ':' || CAST(j AS VARCHAR)), "
            "(d // 4) + 1, 1)) - 1) >> (3 - (d % 4))) & 1) * 2 - 1 AS w "
            f"FROM generate_series(0, {n_tables - 1}) AS tt(t), "
            f"generate_series(0, {n_bits - 1}) AS jj(j), "
            "generate_series(0, 63) AS dd(d))"
        )

    _BITS = (
        "bits AS (SELECT qv.vec_id, h.t, h.j, CASE WHEN "
        "sum(qv.q[h.d + 1] * h.w) >= 0 THEN 1 ELSE 0 END AS bit "
        "FROM qv CROSS JOIN hyper h GROUP BY qv.vec_id, h.t, h.j)"
    )
    # integer bucket id = Σ bit << (n_bits-1-j), mirroring the numpy
    # packing in similarity.lsh_bucket_table
    _BKT_INT = (
        _BITS + ", bkt AS (SELECT vec_id, t, "
        "CAST(sum(bit * (1 << (7 - j))) AS BIGINT) AS bucket "
        "FROM bits GROUP BY vec_id, t)"
    )
    _BKT_STR = (
        _BITS + ", bkt AS (SELECT vec_id, t, string_agg("
        "CAST(bit AS VARCHAR), '' ORDER BY j) AS bucket "
        "FROM bits GROUP BY vec_id, t)"
    )
    # augmented corpus for neardup: each vector plus its +0.05 twin
    # (same double math as the Spark side — IEEE-identical)
    _E2 = (
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings UNION ALL "
        "SELECT vec_id + 1000000, "
        "list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.05) "
        "FROM embeddings), "
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)"
    )
    o["embedding_neardup"] = (
        f"WITH {_E2}, {_QV}, {_hyper('hyper', 16, 8)}, {_BKT_INT}, "
        "cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b "
        "FROM bkt x JOIN bkt y ON x.t = y.t AND x.bucket = y.bucket "
        "AND x.vec_id < y.vec_id) "
        "SELECT a, b, cos FROM ("
        "SELECT cand.a, cand.b, round(list_dot_product(na.v, nb.v) / "
        "(na.nrm * nb.nrm), 4) AS cos FROM cand "
        "JOIN n na ON cand.a = na.vec_id "
        "JOIN n nb ON cand.b = nb.vec_id) WHERE cos >= 0.9"
    )
    # multi-table OR-banding (r4): candidates collide in >= 1 of the 8
    # tables — join on (t, bucket), DISTINCT the bare id pairs before
    # scoring, mirroring topk_lsh(n_tables=8, n_bits=6)
    _sql_lsh = (
        f"WITH {_ES}, {_QV}, {_hyper('hyper', 8, 6)}, {_BKT_STR}, "
        "cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid "
        "FROM bkt q JOIN bkt c ON q.t = c.t AND q.bucket = c.bucket "
        "AND q.vec_id <> c.vec_id WHERE q.vec_id < 10) "
        "SELECT qid, nid, cos, rank FROM ("
        "SELECT cand.qid, cand.nid, "
        "round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos, "
        "row_number() OVER (PARTITION BY cand.qid ORDER BY "
        "round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) DESC, "
        "cand.nid) AS rank "
        "FROM cand JOIN n q ON cand.qid = q.vec_id "
        "JOIN n c ON cand.nid = c.vec_id) WHERE rank <= 5"
    )
    # IVF: hash-chosen anchors -> centroids (quantized int vectors),
    # exact int64 argmax assignment, probed-list join — mirrors
    # similarity.ivf_anchor_ids/ivf_assignments bit-for-bit
    _sql_ivf = (
        f"WITH {_ES}, {_QV}, "
        "ranked AS (SELECT vec_id, row_number() OVER "
        "(ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid "
        "FROM e), "
        "cents AS (SELECT r.cid, qv.q AS cv FROM ranked r "
        "JOIN qv ON r.vec_id = qv.vec_id WHERE r.cid < 16), "
        "score AS (SELECT v.vec_id, c.cid, "
        "list_dot_product(CAST(v.q AS DOUBLE[]), CAST(c.cv AS DOUBLE[])) "
        "AS s FROM qv v CROSS JOIN cents c), "
        "ranked_s AS (SELECT vec_id, cid, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM score), "
        "cassign AS (SELECT vec_id, cid FROM ranked_s WHERE rn = 1), "
        "qassign AS (SELECT vec_id, cid FROM ranked_s "
        "WHERE rn <= 4 AND vec_id < 10) "
        "SELECT qid, nid, cos, rank FROM ("
        "SELECT qa.vec_id AS qid, ca.vec_id AS nid, "
        "round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos, "
        "row_number() OVER (PARTITION BY qa.vec_id ORDER BY "
        "round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) DESC, "
        "ca.vec_id) AS rank "
        "FROM qassign qa JOIN cassign ca ON qa.cid = ca.cid "
        "AND qa.vec_id <> ca.vec_id "
        "JOIN n q ON qa.vec_id = q.vec_id "
        "JOIN n c ON ca.vec_id = c.vec_id) WHERE rank <= 5"
    )
    o["embedding_ann"] = (
        f"SELECT 'brute' AS method, * FROM ({_sql_brute}) "
        f"UNION ALL SELECT 'lsh', * FROM ({_sql_lsh}) "
        f"UNION ALL SELECT 'ivf', * FROM ({_sql_ivf})"
    )
    _W = (
        "tw AS (SELECT doc_id, string_split_regex(lower(text), ' +') AS w, "
        "text FROM documents)"
    )

    def _hits(words):
        lst = ", ".join(f"'{x}'" for x in words)
        return (
            f"CAST(len(list_filter(w, x -> list_contains([{lst}], x))) "
            "AS INT)"
        )

    from rsyslog_spark.dataops.textstats import STOPWORDS as _SW

    _sc = {lang: _hits(words) for lang, words in _SW.items()}
    _GREAT = "greatest(score_de, score_en, score_es, score_fr)"
    o["textstats"] = (
        f"WITH {_W}, s AS (SELECT doc_id, {_sc['en']} AS score_en, "
        f"{_sc['es']} AS score_es, {_sc['fr']} AS score_fr, "
        f"{_sc['de']} AS score_de FROM tw), "
        "q AS (SELECT doc_id, "
        "CAST(len(w) AS BIGINT) AS n_tokens, "
        "round(length(text) / greatest(len(w), 1), 4) AS mean_tok_len, "
        "round(length(regexp_replace(text, '[A-Za-z ]', '', 'g')) / "
        "greatest(length(text), 1), 4) AS punct_ratio, "
        f"round({_sc['en']} / greatest(len(w), 1), 4) AS stop_ratio, "
        "length(text) AS n_chars, "
        "CAST(len(w) AS BIGINT) AS ws_tokens, "
        "CAST(list_sum(list_transform(w, t -> ceil(length(t) / 4.0))) "
        "AS BIGINT) AS bpe_tokens FROM tw), "
        "g AS (SELECT DISTINCT doc_id AS id, "
        "md5(substr(text, p, 8)) AS h FROM documents, "
        "unnest(generate_series(1, greatest(length(text) - 7, 1))) "
        "AS tp(p)), "
        "r AS (SELECT id, h, row_number() OVER (PARTITION BY id "
        "ORDER BY h) AS rn FROM g), "
        "fpx AS (SELECT id, string_agg(h, '' ORDER BY h) AS fp FROM r "
        "WHERE rn <= 4 GROUP BY id), "
        # repetition signals: raw split(' ') tokenization (the dedup
        # convention), non-space chars as the denominator
        "rw AS (SELECT doc_id, string_split(text, ' ') AS rt, "
        "length(replace(text, ' ', '')) AS tc FROM documents), "
        "tkc AS (SELECT doc_id, rt[i] AS tok, count(*) AS c FROM rw, "
        "unnest(generate_series(1, len(rt))) AS z(i) GROUP BY 1, 2), "
        # tc = 0 (empty/whitespace-only doc): impl returns 0.0 for all
        # three signals — guard the divisions the same way
        "ttf AS (SELECT tkc.doc_id, CASE WHEN any_value(rw.tc) = 0 "
        "THEN 0.0 ELSE max(c) / CAST(sum(c) AS DOUBLE) END "
        "AS top_tok_frac FROM tkc JOIN rw USING (doc_id) "
        "GROUP BY tkc.doc_id), "
        "g2c AS (SELECT doc_id, rt[i] || ' ' || rt[i+1] AS g, "
        "count(*) AS c FROM rw, "
        "unnest(generate_series(1, len(rt) - 1)) AS z(i) GROUP BY 1, 2), "
        "g2t AS (SELECT doc_id, g, c, row_number() OVER (PARTITION BY "
        "doc_id ORDER BY c DESC, g) AS rn FROM g2c), "
        "t2f AS (SELECT g2t.doc_id, CASE WHEN rw.tc = 0 THEN 0.0 ELSE "
        "c * (length(g) - 1) / CAST(rw.tc AS DOUBLE) END "
        "AS top2gram_char_frac "
        "FROM g2t JOIN rw USING (doc_id) WHERE rn = 1), "
        "g5c AS (SELECT doc_id, array_to_string(rt[i:i+4], ' ') AS g, "
        "count(*) AS c FROM rw, "
        "unnest(generate_series(1, len(rt) - 4)) AS z(i) GROUP BY 1, 2), "
        "d5f AS (SELECT g5c.doc_id, CASE WHEN any_value(rw.tc) = 0 "
        "THEN 0.0 ELSE sum(c * (length(g) - 4)) / "
        "CAST(any_value(rw.tc) AS DOUBLE) END AS dup5gram_char_frac "
        "FROM g5c JOIN rw USING (doc_id) WHERE c >= 2 GROUP BY g5c.doc_id), "
        # vocab/Zipf facet (r4): two-level wordcount over tkc (the
        # repetition CTE's per-doc counts), empty tokens excluded as in
        # vocab_stats; top-50 by (tf DESC, token)
        "vs AS (SELECT tok AS token, CAST(sum(c) AS BIGINT) AS tf, "
        "CAST(count(*) AS BIGINT) AS doc_freq FROM tkc "
        "WHERE tok <> '' GROUP BY tok), "
        "vrk AS (SELECT * FROM (SELECT CAST(row_number() OVER "
        "(ORDER BY tf DESC, token) AS BIGINT) AS vrank, token, tf, "
        "doc_freq FROM vs) WHERE vrank <= 50), "
        "docf AS ("
        "SELECT s.doc_id, s.score_en, s.score_es, s.score_fr, s.score_de, "
        f"CASE WHEN {_GREAT} = 0 THEN 'und' "
        f"WHEN score_de = {_GREAT} THEN 'de' "
        f"WHEN score_en = {_GREAT} THEN 'en' "
        f"WHEN score_es = {_GREAT} THEN 'es' ELSE 'fr' END AS lang_pred, "
        "q.n_tokens, q.mean_tok_len, q.punct_ratio, q.stop_ratio, "
        "floor(((CASE WHEN q.n_chars BETWEEN 50 AND 100000 THEN 0.4 "
        "ELSE 0.0 END) + (1.0 - least(q.punct_ratio * 2, 1.0)) * 0.3 + "
        "least(q.stop_ratio * 5, 1.0) * 0.3) * 10000 + 0.5) / 10000 "
        "AS quality, "
        "q.ws_tokens, q.bpe_tokens, fpx.fp, "
        "ttf.top_tok_frac, coalesce(t2f.top2gram_char_frac, 0.0) "
        "AS top2gram_char_frac, coalesce(d5f.dup5gram_char_frac, 0.0) "
        "AS dup5gram_char_frac "
        "FROM s JOIN q ON s.doc_id = q.doc_id "
        "JOIN fpx ON s.doc_id = fpx.id "
        "JOIN ttf ON s.doc_id = ttf.doc_id "
        "LEFT JOIN t2f ON s.doc_id = t2f.doc_id "
        "LEFT JOIN d5f ON s.doc_id = d5f.doc_id) "
        "SELECT 'doc' AS facet, d.*, CAST(NULL AS BIGINT) AS vrank, "
        "CAST(NULL AS VARCHAR) AS token, CAST(NULL AS BIGINT) AS tf, "
        "CAST(NULL AS BIGINT) AS doc_freq FROM docf d "
        "UNION ALL SELECT 'vocab', NULL, NULL, NULL, NULL, NULL, NULL, "
        "NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, "
        "NULL, vrank, token, tf, doc_freq FROM vrk"
    )
    _BYTE = (
        "((instr('0123456789abcdef', substr(md5(text), {p1}, 1)) - 1) * 16 "
        "+ instr('0123456789abcdef', substr(md5(text), {p2}, 1)) - 1)"
    )
    _feats = " || ',' || ".join(
        "printf('%.6f', CAST(CAST("
        + _BYTE.format(p1=2 * j + 1, p2=2 * j + 2)
        + " / 255.0 AS FLOAT) AS DOUBLE))"
        for j in range(8)
    )
    o["multimodal"] = (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) "
        f"AS nbytes, md5(text) AS digest, {_feats} AS features_csv, "
        # image-header facet: closed-form container metadata by class
        # (doc_id%5: png/gif/bmp/jpeg/corrupt); channels: png RGBA=4,
        # gif palette->3, bmp 24bpp->3, jpeg 3-component
        "CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' "
        "WHEN 2 THEN 'bmp' WHEN 3 THEN 'jpeg' END AS img_format, "
        "CASE WHEN doc_id % 5 <= 3 "
        "THEN CAST(1 + doc_id % 500 AS INT) END AS img_w, "
        "CASE WHEN doc_id % 5 <= 3 "
        "THEN CAST(1 + doc_id % 300 AS INT) END AS img_h, "
        "CASE doc_id % 5 WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 3 "
        "WHEN 3 THEN 3 END AS img_ch, "
        "(doc_id % 5 <= 3) AS img_ok "
        "FROM documents"
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
