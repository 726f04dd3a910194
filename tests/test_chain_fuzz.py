"""Property-based differential test: arrow chain vs pandas chain.

The pandas chain (`parse_chain_pd`) is the readable reference
implementation; the arrow chain is the production fast path. They must
agree FIELD-FOR-FIELD on arbitrary sanitized inputs, not just the
corpus classes — hypothesis drives structured header fragments and
junk through both (the differential analog of the reference's
testbench fuzzing its parsers with tcpflood variants)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rsyslog_spark.parse.arrow_chain import parse_chain_arrow
from rsyslog_spark.parse.chain import _FIELDS, parse_chain_pd

_PRINTABLE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=40,
)
_MON = st.sampled_from(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec", "Xxx"]
)


@st.composite
def _msg3164(draw):
    mon = draw(_MON)
    day = draw(st.integers(1, 31))
    h, m, s = (draw(st.integers(0, 23)), draw(st.integers(0, 59)),
               draw(st.integers(0, 61)))
    host = draw(st.sampled_from(["host1", "h", "a.b.c", ""]))
    tag = draw(st.sampled_from(["app", "app[12]", "x:", ""]))
    body = draw(_PRINTABLE)
    sp = draw(st.sampled_from([" ", "  "]))
    return f"{mon} {day:2d} {h:02d}:{m:02d}:{s:02d}{sp}{host} {tag} {body}"


@st.composite
def _msg5424(draw):
    ts = draw(st.sampled_from([
        "2024-01-05T10:00:00Z", "2024-01-05T10:00:00.5+02:00",
        "2024-13-05T10:00:00Z", "-", "junk",
    ]))
    sd = draw(st.sampled_from(["-", '[x@1 k="v"]', "[a][b]"]))
    body = draw(_PRINTABLE)
    return f"1 {ts} host app 12 ID7 {sd} {body}"


_ANY = st.one_of(
    _PRINTABLE,
    _msg3164(),
    _msg5424(),
    st.sampled_from([
        "", "1 ", "1", "{\"k\":1}", "[stuff",
        "last message repeated 3 times",
        "  last message repeated 12 TIMES",
        "Jan  1 99:99:99 host app: x",
        "Feb 31 10:00:00 host app: x",
        "Feb 29 10:00:00 host app: x",   # 2024 IS a leap year
        "Jan 32 10:00:00 host app: x",
        "Jan  1 23:59:60 host app: x",   # leap second rolls
        "1 2024-01-05T10:00:00+99:00 h a 1 I - x",
    ]),
)


def _run_both(texts, require_header, with_lastmsg=False):
    n = len(texts)
    recv = pd.Series(pd.to_datetime(["2024-06-01 12:00:00"] * n))
    fac = pd.Series([3] * n)
    fromhost = pd.Series([""] * n)
    has_pri = pd.Series([True if i % 2 else False for i in range(n)])
    parsers = (("lastmsg",) if with_lastmsg else ()) + ("rfc5424", "rfc3164")
    pd_out = parse_chain_pd(
        pd.Series(texts), fac, recv, fromhost, has_pri,
        parsers=parsers, require_header=require_header,
    )
    ar_out = parse_chain_arrow(
        pa.array(texts, pa.string()),
        pa.array([3] * n, pa.int64()),
        pa.array(recv, pa.timestamp("us")),
        pa.array([""] * n, pa.string()),
        pa.array(list(has_pri), pa.bool_()),
        require_header=require_header,
        with_lastmsg=with_lastmsg,
    )
    return pd_out, ar_out


def _assert_equal(pd_out, ar_out, texts):
    for f in _FIELDS:
        a = ar_out[f].to_pandas()
        b = pd_out[f].reset_index(drop=True)
        if f == "timereported":
            a = pd.to_datetime(a)
            b = pd.to_datetime(b)
            same = (a == b) | (a.isna() & b.isna())
        else:
            astr = a.astype("object").where(~pd.isna(a), None)
            bstr = b.astype("object").where(~pd.isna(b), None)
            # '' vs None: the engines may differ in empty-string vs
            # null ONLY for never-rendered optional fields — normalize
            norm = lambda s: s.map(  # noqa: E731
                lambda x: None if x in (None, "") else x
            )
            same = norm(astr).eq(norm(bstr)) | (
                norm(astr).isna() & norm(bstr).isna()
            )
        bad = [i for i, ok in enumerate(same) if not ok]
        assert not bad, (
            f"field {f} differs at rows {bad[:3]}: "
            + "; ".join(
                f"text={texts[i]!r} arrow={a.iloc[i]!r} pandas={b.iloc[i]!r}"
                for i in bad[:3]
            )
        )


@pytest.mark.parametrize("require_header", [False, True])
@given(texts=st.lists(_ANY, min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_chain_differential(require_header, texts):
    pd_out, ar_out = _run_both(texts, require_header)
    _assert_equal(pd_out, ar_out, texts)


@given(texts=st.lists(_ANY, min_size=1, max_size=12))
@settings(max_examples=30, deadline=None)
def test_chain_differential_lastmsg(texts):
    pd_out, ar_out = _run_both(texts, False, with_lastmsg=True)
    _assert_equal(pd_out, ar_out, texts)
