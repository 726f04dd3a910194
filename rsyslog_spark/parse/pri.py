"""PRI ``<NNN>`` decode as native Column expressions (no UDF).

Reference: ``ParsePRI`` runtime/parser.c:576-609 and ``msgSetPRI``
runtime/msg.c:1608-1614. Exact semantics replicated:

- raw message does NOT start with '<'   → pri = DEFUPRI = 13 (user.notice,
  parser.c:47), PRI length consumed = 0.
- starts with '<' and matches ``<digits>`` with value ≤ LOG_MAXPRI=191
  (rsyslog.h:178) → pri = value, consumed = len('<digits>').
- starts with '<' but malformed or value > 191 → pri = LOG_PRI_INVLD = 199
  (rsyslog.h:180: (24<<3)|7), consumed = 0 (parser.c:603-605 resets offset).
- ``<>`` is VALID with pri = 0 (the C loop accepts zero digits then sees '>').

facility = pri >> 3 capped at 24 (pri2fac, rsyslog.h:228-236);
severity = pri & 7 (pri2sev, rsyslog.h:237).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFUPRI = 13  # LOG_USER|LOG_NOTICE, parser.c:47
LOG_PRI_INVLD = 199  # (LOG_FAC_INVLD<<3)|LOG_DEBUG, rsyslog.h:180,218-219
LOG_MAXPRI = 191  # rsyslog.h:178

# The C scanner stops at the first non-digit; valid only if that char is '>'.
# 0-4 digits is enough: any ≥4-digit value is > 191 → INVLD anyway, and the
# C loop also bails once the accumulator exceeds 191.
_PRI_RE = r"^<([0-9]{0,4})>"


def pri_expr(raw: Column) -> Column:
    """PRI value of a raw message column, rsyslog semantics."""
    digits = F.regexp_extract(raw, _PRI_RE, 1)
    matched = raw.rlike(_PRI_RE)
    val = F.when(digits == "", F.lit(0)).otherwise(digits.cast("int"))
    return (
        F.when(~raw.startswith("<"), F.lit(DEFUPRI))
        .when(matched & (val <= LOG_MAXPRI), val)
        .otherwise(F.lit(LOG_PRI_INVLD))
    )


def pri_len_expr(raw: Column) -> Column:
    """Chars consumed by the PRI header (offAfterPRI, msg.h:70)."""
    digits = F.regexp_extract(raw, _PRI_RE, 1)
    matched = raw.rlike(_PRI_RE)
    val = F.when(digits == "", F.lit(0)).otherwise(digits.cast("int"))
    return F.when(
        raw.startswith("<") & matched & (val <= LOG_MAXPRI),
        F.length(digits) + 2,
    ).otherwise(F.lit(0))


def facility_expr(pri: Column) -> Column:
    """pri2fac: fac = pri>>3, > 23 → LOG_FAC_INVLD=24 (rsyslog.h:228-236)."""
    fac = F.shiftright(pri, 3)
    return F.when(fac > 23, F.lit(24)).otherwise(fac)


def severity_expr(pri: Column) -> Column:
    """pri2sev: pri & 7 (rsyslog.h:237)."""
    return pri.bitwiseAND(F.lit(7))


def with_pri(df: DataFrame, raw_col: str = "text") -> DataFrame:
    """Add pri / syslogfacility / syslogseverity / rawmsg_after_pri columns."""
    raw = F.col(raw_col)
    pri = pri_expr(raw)
    return (
        df.withColumn("pri", pri)
        .withColumn("syslogfacility", facility_expr(F.col("pri")))
        .withColumn("syslogseverity", severity_expr(F.col("pri")))
        .withColumn(
            "rawmsg_after_pri",
            F.expr(f"substring({raw_col}, 1 + {_pri_len_sql(raw_col)})"),
        )
    )


def _pri_len_sql(raw_col: str) -> str:
    """SQL-text form of pri_len_expr so substring() stays one expression."""
    return (
        f"CASE WHEN {raw_col} LIKE '<%' "
        f"AND {raw_col} RLIKE '{_PRI_RE}' "
        f"AND CAST(coalesce(nullif(regexp_extract({raw_col}, '{_PRI_RE}', 1), ''), '0') AS INT) <= {LOG_MAXPRI} "
        f"THEN length(regexp_extract({raw_col}, '{_PRI_RE}', 1)) + 2 ELSE 0 END"
    )
