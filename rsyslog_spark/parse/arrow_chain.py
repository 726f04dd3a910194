"""Arrow-native parser chain: the zero-object-churn fast path.

Same semantics as parse_chain_pd (runtime/parser.c chain over
tools/pmrfc5424.c + tools/pmrfc3164.c — see pm3164.py/pm5424.py for the
per-rule citations); different execution strategy: every string stays a
pyarrow Array end-to-end (RE2 extracts, C++ if_else merges), so no
PyObject is allocated per row. Only the timestamp component math drops
to numpy (integer arrays, vectorized).

Control flow is mask-merge instead of subset-scatter: each cascade step
runs over the full array and its result is gated by the masks of the
earlier steps — RE2 is cheap enough that the wasted evaluation on
already-claimed rows costs less than index bookkeeping, and the code
stays branch-free (the GPU-style formulation of the same cascade).

Validated against the pandas reference chain row-for-row
(tests/test_arrow_chain.py) and by the DuckDB oracle gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rsyslog_spark.parse.pm3164 import (
    _RE_HOST,
    _RE_TAG,
    _RE_TS3164_HEAD,
    _RE_TS3164_HP,
    _RE_TS3339_HEAD,
)
from rsyslog_spark.parse.pm5424 import _RE_5424

_EMPTY = pa.scalar("", pa.string())


def _extract(arr: pa.Array, pattern: str) -> dict[str, pa.Array]:
    """extract_regex -> {group: array}; struct validity pushed into the
    children (res.field() would return '' for non-matching rows)."""
    res = pc.extract_regex(arr, pattern)
    names = [f.name for f in res.type]
    fields = res.flatten()
    out = {n: fields[i] for i, n in enumerate(names)}
    out["_ok"] = pc.is_valid(res)
    return out


def _nz(arr: pa.Array) -> pa.Array:
    """Mask: non-null AND non-empty (alternation-branch detection)."""
    return pc.and_kleene(
        pc.is_valid(arr), pc.not_equal(arr, _EMPTY)
    )


def _fill(arr: pa.Array, value="") -> pa.Array:
    return pc.fill_null(arr, value)


def _ints(arr: pa.Array, default: int = 0) -> np.ndarray:
    """String group array -> int64 numpy with default for null/empty.

    Pure arrow cast — pandas to_numeric here costs ~20s/1M-row-chain
    (24 such conversions per batch), the arrow cast is ~100x cheaper."""
    a = pc.fill_null(arr, str(default))
    a = pc.if_else(pc.equal(a, _EMPTY), pa.scalar(str(default)), a)
    return pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)


_MONTH_NUM = {
    m: i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}


def _epoch_us(y, mo, d, hh, mi, ss) -> np.ndarray:
    """Vectorized civil-datetime -> epoch microseconds (int64).

    Days-from-civil (Howard Hinnant's algorithm) in numpy int math —
    no per-row datetime objects."""
    y = y.astype(np.int64)
    mo = mo.astype(np.int64)
    yy = y - (mo <= 2)
    era = np.where(yy >= 0, yy, yy - 399) // 400
    yoe = yy - era * 400
    doy = (153 * (np.where(mo > 2, mo - 3, mo + 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    return ((days * 86400 + hh * 3600 + mi * 60 + ss) * 1_000_000).astype(
        "int64"
    )


_DIM = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def _calendar_ok(y, mo, d, hh, mi, ss, ss_max=59) -> np.ndarray:
    """Field-range + calendar validation. The reference checks ranges
    only (month 1-12, day 1-31, hour 0-23, min 0-59, sec 0-60 —
    datetime.c:329-358) and lets mktime normalize; we additionally
    reject non-calendar dates (Feb 31) so both chain engines agree
    deterministically. Leap second 60 is accepted on the 3164 path
    (ss_max=60, rolls into the next minute like mktime — the pandas
    reference path does the same) and rejected on the 3339 path (ISO
    parsing rejects it)."""
    mo_c = np.clip(mo, 1, 12).astype(np.int64)
    dim = _DIM[mo_c - 1]
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = np.where((mo_c == 2) & leap, 29, dim)
    return (
        (mo >= 1) & (mo <= 12) & (d >= 1) & (d <= dim)
        & (hh >= 0) & (hh <= 23) & (mi >= 0) & (mi <= 59)
        & (ss >= 0) & (ss <= ss_max)
    )


def _ts3339_us(g: dict, recv_us: np.ndarray, ok: np.ndarray) -> np.ndarray:
    """RFC3339 groups -> epoch µs (UTC-normalized); fallback recv."""
    y = _ints(g["y"], 1970)
    mo = _ints(g["mo"], 1)
    d = _ints(g["d"], 1)
    hh = _ints(g["hh"])
    mi = _ints(g["mi"])
    ss = _ints(g["sec"])
    ok = ok & _calendar_ok(y, mo, d, hh, mi, ss)
    base = _epoch_us(y, mo, d, hh, mi, ss)
    # fractional seconds: '.5' -> 500000 µs ('0'+frac casts cleanly)
    frac_s = pc.binary_join_element_wise(
        pa.scalar("0", pa.string()), _fill(g["frac"], ""), ""
    )
    frac = pc.cast(frac_s, pa.float64()).to_numpy(zero_copy_only=False)
    base = base + (frac * 1_000_000).astype("int64")
    # zone: Z / ±hh:mm -> subtract offset to normalize to UTC
    zone = _fill(g["zone"], "Z")
    neg = pc.starts_with(zone, "-").to_numpy(zero_copy_only=False)
    zh = _ints(pc.utf8_slice_codeunits(zone, 1, 3))
    zm = _ints(pc.utf8_slice_codeunits(zone, 4, 6))
    # offset hour/min ranges (datetime.c:377-392)
    ok = ok & (zh <= 23) & (zm <= 59)
    off_us = (np.where(neg, -1, 1) * (zh * 60 + zm) * 60 * 1_000_000).astype(
        "int64"
    )
    out = base - off_us
    return np.where(ok, out, recv_us)


def _civil_ym(days: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of _epoch_us's day math: days-since-epoch -> (year, month)
    (civil_from_days, same algorithm family)."""
    z = days.astype(np.int64) + 719468
    era = np.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    m = np.where(mp < 10, mp + 3, mp - 9)
    return (y + (m <= 2)).astype(np.int64), m.astype(np.int64)


_MONTHS_ARR = pa.array(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
)


def _ts3164_us(g: dict, recv_us: np.ndarray, ok: np.ndarray) -> np.ndarray:
    """RFC3164 groups + year estimation (datetime.c:465,
    rainerscript.c:2620-2633 Dec/Jan rollover) -> epoch µs."""
    mo_idx = pc.index_in(_fill(g["mon"], "Jan"), value_set=_MONTHS_ARR)
    mo = pc.fill_null(mo_idx, 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    ) + 1
    d = _ints(pc.utf8_trim_whitespace(_fill(g["day"], "1")), 1)
    hh = _ints(g["h"])
    mi = _ints(g["mi"])
    ss = _ints(g["s"])
    ry, rm = _civil_ym(recv_us // 86_400_000_000)
    y = ry.copy()
    y[(mo == 12) & (rm == 1)] -= 1
    y[(mo == 1) & (rm == 12)] += 1
    ok = ok & _calendar_ok(y, mo, d, hh, mi, ss, ss_max=60)
    out = _epoch_us(y, mo, d, hh, mi, ss)
    return np.where(ok, out, recv_us)


def parse_chain_arrow(
    after_pri: pa.Array,
    facility: pa.Array,
    recv_ts: pa.Array,
    fromhost: pa.Array,
    has_pri: pa.Array,
    require_header: bool = False,
    with_lastmsg: bool = False,
) -> dict[str, pa.Array]:
    """Full chain over arrow arrays; returns the PARSED_STRUCT columns.

    ``with_lastmsg`` puts pmlastmsg on top of the parser stack
    (plugins/pmlastmsg/pmlastmsg.c:90-130 — 'should be placed on top'):
    rows matching 'last message repeated N times' take MSG = the whole
    after-PRI text, TAG '', TS = received time, legacy protocol."""
    s = _fill(after_pri.cast(pa.string()))
    fromhost = _fill(fromhost.cast(pa.string()))
    has_pri = pc.fill_null(has_pri.cast(pa.bool_()), False)
    n = len(s)
    recv_us = recv_ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )

    # ---- pmrfc5424 (guard decides ownership, pmrfc5424.c:224-226) ----
    use5 = pc.starts_with(s, "1 ")
    g5 = _extract(s, _RE_5424)
    matched5 = pc.and_(use5, g5["_ok"])
    bad5 = pc.and_(use5, pc.invert(g5["_ok"]))
    dash = pa.scalar("-", pa.string())

    def _f5(name):
        return pc.if_else(matched5, _fill(g5[name]), dash)

    ts5_txt = _f5("ts")
    host5 = _f5("host")
    app5 = _f5("app")
    procid5 = _f5("procid")
    msgid5 = _f5("msgid")
    sd5 = _f5("sd")
    msg5 = pc.if_else(
        matched5, _fill(g5["msg"]), pc.utf8_slice_codeunits(s, 2, 2**30)
    )
    tag5 = pc.if_else(
        pc.equal(procid5, dash),
        app5,
        pc.binary_join_element_wise(app5, "[", procid5, "]", ""),
    )
    gt5 = _extract(ts5_txt, r"^(?P<y>\d{4})-(?P<mo>\d{2})-(?P<d>\d{2})"
                            r"[Tt](?P<hh>\d{2}):(?P<mi>\d{2}):(?P<sec>\d{2})"
                            r"(?P<frac>\.\d+)?(?P<zone>[Zz]|[+-]\d{2}:\d{2})$")
    ts5_us = _ts3339_us(gt5, recv_us, gt5["_ok"].to_numpy(zero_copy_only=False))

    # ---- pmrfc3164 ----------------------------------------------------
    fac_invld = pc.equal(facility.cast(pa.int64()), 24)
    headerless = pc.and_(
        pc.invert(fac_invld),
        pc.match_substring_regex(s, r"^[ \t]*[\{\[]"),
    )
    noheader = pc.or_(fac_invld, headerless)

    g39 = _extract(s, _RE_TS3339_HEAD)
    ok39 = g39["_ok"]
    rest1 = pc.if_else(ok39, _fill(g39["rest"]), s)
    g64 = _extract(rest1, _RE_TS3164_HEAD)
    ok64 = pc.and_(g64["_ok"], pc.invert(ok39))
    rest2 = pc.if_else(ok64, _fill(g64["rest"]), rest1)
    ghp = _extract(rest2, _RE_TS3164_HP)
    okhp = pc.and_(ghp["_ok"], pc.invert(pc.or_(ok39, ok64)))
    rest3 = pc.if_else(okhp, _fill(ghp["rest"]), rest2)

    gh = _extract(rest3, _RE_HOST)
    hfull = _nz(gh["hfull"])
    hsp = _nz(gh["hsp"])
    host3164 = pc.if_else(
        hfull, _fill(gh["hfull"]),
        pc.if_else(hsp, _fill(gh["hsp"]), fromhost),
    )
    rest4 = pc.if_else(
        hfull, _EMPTY, pc.if_else(hsp, _fill(gh["hrest"]), rest3)
    )

    gt = _extract(rest4, _RE_TAG)
    tag3164 = pc.binary_join_element_wise(
        _fill(gt["tag"]), _fill(gt["colon"]), ""
    )
    msg3164 = _fill(gt["mrest"])

    # headerless/invalid-PRI rows: whole text is MSG (pmrfc3164.c:190-205)
    msg3164 = pc.if_else(noheader, s, msg3164)
    tag3164 = pc.if_else(noheader, _EMPTY, tag3164)
    host3164 = pc.if_else(noheader, fromhost, host3164)

    # timestamp text + value
    ts64_txt_np = pc.binary_join_element_wise(
        _fill(g64["mon"]), " ", _fill(g64["day"]), " ",
        _fill(g64["h"]), ":", _fill(g64["mi"]), ":", _fill(g64["s"]), "",
    )
    tshp_txt = pc.binary_join_element_wise(
        _fill(ghp["mon"]), " ", _fill(ghp["day"]), " ",
        _fill(ghp["h"]), ":", _fill(ghp["mi"]), ":", _fill(ghp["s"]), "",
    )
    null_str = pa.nulls(n, pa.string())
    ts_txt3164 = pc.if_else(
        pc.and_(ok39, pc.invert(noheader)), _fill(g39["all"]),
        pc.if_else(
            pc.and_(ok64, pc.invert(noheader)), ts64_txt_np,
            pc.if_else(pc.and_(okhp, pc.invert(noheader)), tshp_txt,
                       null_str),
        ),
    )
    np39 = pc.and_(ok39, pc.invert(noheader)).to_numpy(zero_copy_only=False)
    np64 = pc.and_(ok64, pc.invert(noheader)).to_numpy(zero_copy_only=False)
    nphp = pc.and_(okhp, pc.invert(noheader)).to_numpy(zero_copy_only=False)
    us39 = _ts3339_us(g39, recv_us, np39)
    us64 = _ts3164_us(g64, recv_us, np64)
    ushp = _ts3164_us(ghp, recv_us, nphp)
    ts3164_us = np.where(np39, us39, np.where(np64, us64,
                         np.where(nphp, ushp, recv_us)))

    if require_header:
        acc3164_pa = pc.or_(
            pc.or_(noheader, has_pri), pc.or_(ok39, pc.or_(ok64, okhp))
        )
    else:
        acc3164_pa = pa.array(np.ones(n, dtype=bool))

    # ---- merge chain results (parser.c:654-687) -----------------------
    if with_lastmsg:
        ownL = pc.match_substring_regex(
            s, r"(?i)^ *last message repeated \d+ times$"
        )
    else:
        ownL = pa.array(np.zeros(n, dtype=bool))
    notL = pc.invert(ownL)
    own5 = pc.and_(notL, use5)
    own3164 = pc.and_(pc.and_(notL, pc.invert(own5)), acc3164_pa)
    failed = pc.and_(
        pc.and_(notL, pc.invert(own5)), pc.invert(acc3164_pa)
    )

    def merge_str(v5, v3, vfail):
        return pc.if_else(own5, v5, pc.if_else(own3164, v3, vfail))

    empty_str = pa.scalar("", pa.string())
    hostname = merge_str(host5, host3164, fromhost)
    syslogtag = pc.if_else(
        ownL, empty_str, merge_str(tag5, tag3164, null_str)
    )
    app_name = pc.if_else(own5, app5, null_str)
    # 3164 has no PROCID header field -> null at chain level; the legacy
    # TAG-based emulation (msg.c:1495-1542) runs natively after the chain
    procid = pc.if_else(own5, procid5, null_str)
    msgid = pc.if_else(own5, msgid5, null_str)
    sd = pc.if_else(own5, sd5, null_str)
    msg = pc.if_else(ownL, s, merge_str(msg5, msg3164, s))
    ts_text = pc.if_else(
        ownL, null_str, merge_str(ts5_txt, ts_txt3164, null_str)
    )
    own5_np = own5.to_numpy(zero_copy_only=False)
    own3164_np = own3164.to_numpy(zero_copy_only=False)
    timereported = np.where(own5_np, ts5_us,
                            np.where(own3164_np, ts3164_us, recv_us))
    parser = pc.if_else(
        ownL, pa.scalar("lastmsg", pa.string()),
        pc.if_else(
            own5, pa.scalar("rfc5424", pa.string()),
            pc.if_else(own3164, pa.scalar("rfc3164", pa.string()),
                       pa.scalar("none", pa.string())),
        ),
    )
    parse_success = pc.invert(failed)
    protocol_version = pc.if_else(
        own5, pa.scalar(1, pa.int32()), pa.scalar(0, pa.int32())
    )

    return {
        "protocol_version": protocol_version,
        "timestamp_text": ts_text,
        "hostname": hostname,
        "syslogtag": syslogtag,
        "app_name": app_name,
        "procid": procid,
        "msgid": msgid,
        "structured_data": sd,
        "msg": msg,
        "parse_success": parse_success,
        "parser": parser,
        "timereported": pa.array(timereported).cast(pa.timestamp("us")),
    }
