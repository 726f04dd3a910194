"""Schemas: transcript input + parsed-message core columns.

The message object is rsyslog's single dataflow value (runtime/msg.h:60-136,
"Once created, it actually is a read-only object" msg.h:44-53) — i.e. an
immutable row. We map its fixed fields to a flat StructType (schema-on-write
core) and its dynamic ``$!`` CEE tree to a ``map<string,string>`` column
(schema-on-read bag), per SURVEY.md §1.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table shape mandated by BASELINE.json input_hint.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Struct returned by the header parser chain (one Arrow-batched UDF call).
# Field ↔ reference mapping:
#   protocol_version : msg.h:72 iProtocolVersion (0 legacy / 1 RFC5424)
#   timestamp_text   : raw TIMESTAMP field text (tTIMESTAMP, msg.h:111);
#                      kept as text so formatting round-trips byte-exactly
#   hostname         : msg.h:81 pszHOSTNAME
#   syslogtag        : msg.h:122 TAG (includes trailing ':' if present)
#   app_name/procid/msgid : msg.h:92-94 (RFC5424 header fields)
#   structured_data  : msg.h:90 pszStrucData, raw unparsed string
#                      (pmrfc5424.c:111-122 "does NOT parse inside")
#   msg              : the MSG part after the header
#   parse_success    : msg.h:67 bParseSuccess
#   parser           : which parser in the chain accepted (parser.c:654-672)
PARSED_STRUCT = T.StructType(
    [
        T.StructField("protocol_version", T.IntegerType()),
        T.StructField("timestamp_text", T.StringType()),
        T.StructField("hostname", T.StringType()),
        T.StructField("syslogtag", T.StringType()),
        T.StructField("app_name", T.StringType()),
        T.StructField("procid", T.StringType()),
        T.StructField("msgid", T.StringType()),
        T.StructField("structured_data", T.StringType()),
        T.StructField("msg", T.StringType()),
        T.StructField("parse_success", T.BooleanType()),
        T.StructField("parser", T.StringType()),
        T.StructField("timereported", T.TimestampType()),
    ]
)

# Full parsed-message column set after parse + PRI decode (SURVEY §1.1).
# These are the "message properties" of msg.c:576-631 that filters and
# templates may reference.
MESSAGE_COLUMNS = [
    "rawmsg",
    "pri",
    "syslogfacility",
    "syslogseverity",
    "protocol_version",
    "timestamp_text",
    "timereported",
    "timegenerated",
    "hostname",
    "syslogtag",
    "programname",
    "app_name",
    "procid",
    "msgid",
    "structured_data",
    "msg",
    "parse_success",
    "inputname",
    "fromhost",
    "fromhost_ip",
]

# PRI text name tables (runtime/rsyslog.h facility/severity codes; the
# textual names as used by syslogfacility-text / syslogseverity-text
# properties, msg.c getFacility/getSeverity text forms).
SEVERITY_NAMES = [
    "emerg",
    "alert",
    "crit",
    "err",
    "warning",
    "notice",
    "info",
    "debug",
]
FACILITY_NAMES = [
    "kern",
    "user",
    "mail",
    "daemon",
    "auth",
    "syslog",
    "lpr",
    "news",
    "uucp",
    "cron",
    "authpriv",
    "ftp",
    "ntp",
    "audit",
    "alert",
    "clock",
    "local0",
    "local1",
    "local2",
    "local3",
    "local4",
    "local5",
    "local6",
    "local7",
    "invld",
]
