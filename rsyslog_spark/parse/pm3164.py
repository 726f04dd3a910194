"""Legacy RFC3164 parser, vectorized (reference: tools/pmrfc3164.c, 418 LoC).

Replicated control flow (pmrfc3164.c:180-382):

1. facility == LOG_FAC_INVLD (invalid PRI) -> do not parse a header at
   all; the whole text is MSG (pmrfc3164.c:190-193).
2. headerless detection: optional spaces/tabs then '{' or '[' -> whole
   text is MSG, hostname falls back to ``fromhost``, empty TAG
   (pmrfc3164.c:195-205).
3. timestamp: RFC3339 first, then RFC3164 ``Mmm [d]d hh:mm:ss``, then the
   HP-Procurve retry (leading space + RFC3164) (pmrfc3164.c:208-235).
   The timestamp parser consumes the timestamp plus one trailing SP
   delimiter (runtime/datetime.c ParseTIMESTAMP3164/3339 behavior).
4. hostname: char-walk over [A-Za-z0-9._-]; it is a hostname iff
   (a) it consumed the entire remainder, or (b) >=1 char was consumed AND
   the last consumed char is alphanumeric AND the next char is SP
   (pmrfc3164.c:267-325). Otherwise no hostname (-> ``fromhost``) and the
   same text is re-scanned as TAG. Because the char-walk is maximal-munch
   over one character class, both cases are exactly expressible as
   anchored regexes (a shorter match cannot be followed by SP, so greedy
   regex == C walk).
5. TAG: chars up to ':' or SP; a ':' is part of the TAG and consumed;
   an SP is NOT consumed — it stays in MSG ("a SP ... is CONTENT",
   pmrfc3164.c:327-366).
6. MSG: the rest.

RFC3164 timestamps carry no year: the year comes from reception time with
Dec/Jan boundary correction (runtime/datetime.c:465 ff.; same rule as
estimateYear, grammar/rainerscript.c:2620-2633).

Options (pmrfc3164.c:63-70) default off and are not implemented, except
``require_header`` — an EXTENSION of this engine (not in the reference):
when set, a message with neither a PRI ``<`` prefix nor a parsable
timestamp nor a headerless-JSON shape is REJECTED (COULD_NOT_PARSE), so
the chain's discard path (runtime/parser.c:679-687) is exercisable; the
stock reference pmrfc3164 never returns COULD_NOT_PARSE.

Everything is pandas-vectorized (str.match / str.extract / str.replace);
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rsyslog_spark.parse import fastre
from rsyslog_spark.parse.pm5424 import _RE_TS3339, parse_ts3339

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
_MONTH_NUM = {
    m: i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}

# 'Mmm dd hh:mm:ss' with single-digit day padded as 'Mmm  d'
_TS3164_BODY = (
    rf"(?P<mon>{_MONTHS}) (?P<day> ?\d|\d\d) "
    r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})"
)
# each cascade step is ONE extract capturing both the timestamp and the
# remainder ("consume ts + one SP delimiter", datetime.c behavior) —
# a second strip pass over the same strings would double the regex cost.
_RE_TS3164_HEAD = rf"^{_TS3164_BODY}(?:$| (?P<rest>[\s\S]*)$)"
_RE_TS3164_HP = rf"^ {_TS3164_BODY}(?:$| (?P<rest>[\s\S]*)$)"

_RE_TS3339_BODY = _RE_TS3339[1:-1]  # strip ^ $ anchors
_RE_TS3339_HEAD = rf"^(?P<all>{_RE_TS3339_BODY})(?:$| (?P<rest>[\s\S]*)$)"

# hostname heuristic as ONE alternation (see point 4 above): entire
# remainder is host, OR host with alnum last char followed by SP.
_RE_HOST = (
    r"^(?:(?P<hfull>[A-Za-z0-9._-]+)$"
    r"|(?P<hsp>[A-Za-z0-9._-]*[A-Za-z0-9]) (?P<hrest>[\s\S]*)$)"
)

# TAG up to ':' (consumed, kept in TAG) or SP (not consumed -> MSG)
_RE_TAG = r"^(?P<tag>[^: ]*)(?P<colon>:?)(?P<mrest>[\s\S]*)$"


def _estimate_year(mon: pd.Series, recv_ts: pd.Series) -> pd.Series:
    """Year from reception time with Dec/Jan rollover
    (datetime.c:465 ff.; rainerscript.c:2620-2633)."""
    ry = recv_ts.dt.year.fillna(2024).astype(int)
    rm = recv_ts.dt.month.fillna(1).astype(int)
    y = ry.copy()
    y[(mon == 12) & (rm == 1)] = ry - 1
    y[(mon == 1) & (rm == 12)] = ry + 1
    return y


def _ts3164_values(g: pd.DataFrame, recv_ts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(timestamp_text, timereported) for matched 3164 groups."""
    mon = g["mon"].map(_MONTH_NUM).astype(int)
    year = _estimate_year(mon, recv_ts)
    sec = g["s"].astype(int)
    t = pd.to_datetime(
        pd.DataFrame(
            {
                "year": year.values,
                "month": mon.values,
                "day": g["day"].str.strip().astype(int).values,
                "hour": g["h"].astype(int).values,
                "minute": g["mi"].astype(int).values,
                "second": sec.values,
            }
        ),
        errors="coerce",
    )
    t.index = g.index
    # pandas normalizes ANY out-of-range second; the reference accepts
    # only 0-60 (leap second, datetime.c:707) — reject 61+ like it does
    t = t.where(sec <= 60)
    txt = g["mon"] + " " + g["day"] + " " + g["h"] + ":" + g["mi"] + ":" + g["s"]
    return txt, t.where(t.notna(), recv_ts).astype("datetime64[us]")


def parse_3164(
    after_pri: pd.Series,
    facility: pd.Series,
    recv_ts: pd.Series,
    fromhost: pd.Series | None = None,
    has_pri: pd.Series | None = None,
    require_header: bool = False,
) -> pd.DataFrame:
    """Vectorized legacy-syslog parse. Returns PARSED_STRUCT fields +
    ``accepted`` + ``timereported``."""
    s = after_pri.fillna("")
    n = len(s)
    idx = s.index
    if fromhost is None:
        fromhost = pd.Series([""] * n, index=idx, dtype="object")
    if has_pri is None:
        has_pri = pd.Series(True, index=idx)

    hostname = fromhost.astype("object").copy()
    tag = pd.Series([""] * n, index=idx, dtype="object")
    msg = pd.Series([""] * n, index=idx, dtype="object")
    ts_text = pd.Series([None] * n, index=idx, dtype="object")
    timereported = pd.Series(recv_ts.values, index=idx).astype("datetime64[us]")

    # 1 + 2: rows with no header to parse
    fac_invld = facility == 24
    headerless = ~fac_invld & fastre.matches(s, r"^[ \t]*[\{\[]")
    noheader = fac_invld | headerless
    msg[noheader] = s[noheader]

    rest = s[~noheader].copy()

    # 3. timestamp cascade: 3339 -> 3164 -> HP retry (one extract each,
    # run only on the rows still unmatched)
    g39 = fastre.extract(rest, _RE_TS3339_HEAD)
    m39 = g39["all"].notna()
    if m39.any():
        i39 = g39.index[m39]
        ts_text[i39] = g39.loc[i39, "all"]
        t = parse_ts3339(g39.loc[i39, "all"])
        timereported[i39] = t.where(t.notna(), recv_ts[i39]).astype("datetime64[us]")
        rest.loc[i39] = g39.loc[i39, "rest"].fillna("")

    un = rest.index[~m39]
    g64 = fastre.extract(rest.loc[un], _RE_TS3164_HEAD)
    m64 = g64["mon"].notna()
    if m64.any():
        i64 = g64.index[m64]
        txt, t = _ts3164_values(g64.loc[i64], recv_ts[i64])
        ts_text[i64] = txt
        timereported[i64] = t
        rest.loc[i64] = g64.loc[i64, "rest"].fillna("")

    unhp = g64.index[~m64]
    if len(unhp):
        ghp = fastre.extract(rest.loc[unhp], _RE_TS3164_HP)
        mhp = ghp["mon"].notna()
        if mhp.any():
            ihp = ghp.index[mhp]
            txt, t = _ts3164_values(ghp.loc[ihp], recv_ts[ihp])
            ts_text[ihp] = txt
            timereported[ihp] = t
            rest.loc[ihp] = ghp.loc[ihp, "rest"].fillna("")

    # 4. hostname heuristic (one extract). Branch detection must be by
    # NON-EMPTINESS: both host groups are 1+ chars when their branch
    # matched, and RE2 reports non-participating groups as "" (fastre).
    gh = fastre.extract(rest, _RE_HOST)
    full = gh["hfull"].notna() & (gh["hfull"] != "")
    sp = gh["hsp"].notna() & (gh["hsp"] != "")
    if full.any():
        hostname[gh.index[full]] = gh.loc[full, "hfull"]
        rest.loc[gh.index[full]] = ""
    if sp.any():
        hostname[gh.index[sp]] = gh.loc[sp, "hsp"]
        rest.loc[gh.index[sp]] = gh.loc[sp, "hrest"]

    # 5. TAG: ':' is part of TAG and consumed; SP stays in MSG
    # (one extract; when TAG ends at SP the SP lands in mrest -> MSG)
    gt = fastre.extract(rest, _RE_TAG)
    tag[rest.index] = (gt["tag"].fillna("") + gt["colon"].fillna("")).values
    msg[rest.index] = gt["mrest"].fillna("").values

    if require_header:
        accepted = noheader | has_pri | ts_text.notna()
    else:
        accepted = pd.Series(True, index=idx)

    return pd.DataFrame(
        {
            "accepted": accepted,
            "protocol_version": np.zeros(n, dtype="int32"),
            "timestamp_text": ts_text,
            "hostname": hostname,
            "syslogtag": tag,
            "app_name": pd.Series([None] * n, index=idx, dtype="object"),
            "procid": pd.Series([None] * n, index=idx, dtype="object"),
            "msgid": pd.Series([None] * n, index=idx, dtype="object"),
            "structured_data": pd.Series([None] * n, index=idx, dtype="object"),
            "msg": msg,
            "timereported": timereported,
        },
        index=idx,
    )
