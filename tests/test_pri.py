"""PRI decode truth table vs the C semantics (runtime/parser.c:576-609,
runtime/msg.c:1608-1614, runtime/rsyslog.h:178-237)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.parse.pri import (
    facility_expr,
    pri_expr,
    pri_len_expr,
    severity_expr,
)

CASES = [
    # (raw, pri, facility, severity, consumed)
    ("<0>x", 0, 0, 0, 3),
    ("<13>x", 13, 1, 5, 4),
    ("<191>x", 191, 23, 7, 5),
    ("<192>x", 199, 24, 7, 0),     # > LOG_MAXPRI -> INVLD
    ("<1911>x", 199, 24, 7, 0),    # accumulates past 191 -> INVLD
    ("<>x", 0, 0, 0, 2),           # zero digits then '>' is valid pri 0
    ("<abc>x", 199, 24, 7, 0),     # non-digit stops scan, no '>' at stop
    ("<12a>x", 199, 24, 7, 0),
    ("<12", 199, 24, 7, 0),        # unterminated
    ("no pri", 13, 1, 5, 0),       # DEFUPRI (parser.c:47)
    ("", 13, 1, 5, 0),
    ("x<13>", 13, 1, 5, 0),        # '<' not at offset 0
]


def test_pri_truth_table(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "raw string")
    rows = (
        df.select(
            "raw",
            pri_expr(F.col("raw")).alias("pri"),
            pri_len_expr(F.col("raw")).alias("plen"),
        )
        .withColumn("fac", facility_expr(F.col("pri")))
        .withColumn("sev", severity_expr(F.col("pri")))
        .collect()
    )
    got = {r["raw"]: (r["pri"], r["fac"], r["sev"], r["plen"]) for r in rows}
    for raw, pri, fac, sev, plen in CASES:
        assert got[raw] == (pri, fac, sev, plen), (raw, got[raw])


def test_all_200_fac_sev_pairs(spark):
    """Every valid (facility 0-24, severity 0-7) combination decodes."""
    rows = [(f"<{f * 8 + s}>m", f, s) for f in range(24) for s in range(8)]
    df = spark.createDataFrame(rows, "raw string, f int, s int")
    bad = (
        df.withColumn("pri", pri_expr(F.col("raw")))
        .withColumn("fac", facility_expr(F.col("pri")))
        .withColumn("sev", severity_expr(F.col("pri")))
        .filter("fac != f OR sev != s")
        .count()
    )
    assert bad == 0
