"""Row-for-row equivalence: arrow-native chain vs the pandas reference
chain, over the full generated corpus (all four text classes) plus the
hand-golden edge cases from test_parse."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from rsyslog_spark.parse.arrow_chain import parse_chain_arrow
from rsyslog_spark.parse.chain import parse_chain_pd
from rsyslog_spark.sources.transcripts import transcripts_sql_duckdb

RECV = pd.Timestamp("2024-06-15 12:00:00")

EDGE_CASES = [
    "Jan  5 10:01:02 host01 app[42]: hello",
    "Dec 25 23:59:59 h a: m",
    "Jan  5 10:00:00 host01 word rest",
    "Jan  5 10:00:00 app[42]: m",
    "Jan  5 10:00:00 abc-. rest",
    "Jan  5 10:00:00 onlyhost",
    '{"a":1}',
    "   [1,2]",
    "host01 app: m",
    " Jan  5 10:00:00 h a: m",
    "2024-02-03T01:02:03+02:00 myhost app: x",
    "1 2024-01-05T10:02:03.5Z h01 app 77 MID [x@1 a=\"b\"] the msg",
    "1 - - - - - just msg",
    "1 - host app - MID - m",
    r'1 - h a p m [x@1 k="a\]b"] msg',
    '1 - h a p m [x@1 k="v"][y@2 j="w"] msg',
    "1 - h a p m -",
    "2 2024-01-05T10:02:03Z h a p m - msg",
    "1 2024-01-05T10:00:00-03:30 h a p m - x",
    "garbage text",
    "",
    "1 bogus-not-a-header",
]


def _compare(after, fac, recv, fromhost, has_pri, require_header):
    ref = parse_chain_pd(
        after, fac, recv, fromhost, has_pri, require_header=require_header
    ).reset_index(drop=True)
    got_arrays = parse_chain_arrow(
        pa.Array.from_pandas(after, type=pa.string()),
        pa.Array.from_pandas(fac, type=pa.int64()),
        pa.Array.from_pandas(recv, type=pa.timestamp("us")),
        pa.Array.from_pandas(fromhost, type=pa.string()),
        pa.Array.from_pandas(has_pri, type=pa.bool_()),
        require_header=require_header,
    )
    got = pd.DataFrame({k: v.to_pandas() for k, v in got_arrays.items()})
    for col in ref.columns:
        a, b = ref[col], got[col]
        if col == "protocol_version":
            a = a.astype("int64")
            b = b.astype("int64")
        mism = ~((a == b) | (a.isna() & b.isna()))
        assert not mism.any(), (
            f"col {col!r}: {mism.sum()} mismatches, first at "
            f"{mism.idxmax()}: ref={a[mism.idxmax()]!r} "
            f"got={b[mism.idxmax()]!r} input={after[mism.idxmax()]!r}"
        )


class TestArrowChainEquivalence:
    @pytest.mark.parametrize("require_header", [True, False])
    def test_edge_cases(self, require_header):
        n = len(EDGE_CASES)
        _compare(
            pd.Series(EDGE_CASES),
            pd.Series([1] * n),
            pd.Series([RECV] * n),
            pd.Series(["rxhost"] * n),
            pd.Series([True, False] * (n // 2) + [True] * (n % 2)),
            require_header,
        )

    def test_invalid_facility(self):
        _compare(
            pd.Series(["<999 whatever", "Jan  5 10:00:00 h a: m"]),
            pd.Series([24, 24]),
            pd.Series([RECV, RECV]),
            pd.Series(["rx", "rx"]),
            pd.Series([True, True]),
            False,
        )

    def test_generated_corpus(self):
        df = duckdb.sql(
            transcripts_sql_duckdb("/root/testdata/sf0.01")
        ).df()
        after = df["text"].str.replace(r"^<\d{0,4}>", "", regex=True)
        fac = ((df["i"] % 24).where(df["text"].str.startswith("<"), 1)).astype(
            "int64"
        )
        _compare(
            after,
            fac,
            df["ts"],
            pd.Series([""] * len(df)),
            df["text"].str.startswith("<"),
            True,
        )

    def test_year_rollover(self):
        _compare(
            pd.Series(["Dec 31 23:00:00 h a: m", "Jan  1 00:00:05 h a: m"]),
            pd.Series([1, 1]),
            pd.Series(
                [pd.Timestamp("2025-01-01 00:05:00"),
                 pd.Timestamp("2024-12-31 23:59:00")]
            ),
            pd.Series(["rx", "rx"]),
            pd.Series([True, True]),
            False,
        )
