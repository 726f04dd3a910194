"""RFC5424 header parser, vectorized (reference: tools/pmrfc5424.c, 329 LoC).

Semantics:

- Accepts only if the text after PRI starts with ``"1 "`` (version guard,
  pmrfc5424.c:224-226); otherwise returns COULD_NOT_PARSE and the chain
  falls through to the legacy parser (runtime/parser.c:654-672).
- TIMESTAMP HOSTNAME APP-NAME PROCID MSGID are SP-terminated tokens
  (parseRFCField, pmrfc5424.c:80-108); ``-`` is the nil value and is kept
  verbatim (the reference stores the literal token).
- STRUCTURED-DATA is either ``-`` or one-or-more bracket-balanced
  ``[...]`` groups honoring backslash escapes (``\\]`` does not close);
  it is kept as a RAW string, never parsed inside
  (parseRFCStructuredData, pmrfc5424.c:123-193 and note at :111-122).
- MSG is everything after the SP following SD (pmrfc5424.c:292).
- TIMESTAMP ``-`` means "use reception time" (pmrfc5424.c:247-250).
- TAG is emulated as ``APP-NAME[PROCID]``, or bare APP-NAME when PROCID
  is ``-`` (tryEmulateTAG, runtime/msg.c:2482-2514).

All implemented as pandas vectorized ops (str.extract / masks) — no
per-row Python on the happy path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rsyslog_spark.parse import fastre

# header + SD + optional MSG, in one extract.  SD group: '-' or 1+
# bracket groups where the interior allows any escaped char.
_RE_5424 = (
    r"^1 (?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) (?P<procid>\S+) "
    r"(?P<msgid>\S+) (?P<sd>-|(?:\[(?:[^\]\\]|\\.)*\])+)(?: (?P<msg>[\s\S]*))?$"
)

_RE_TS3339 = (
    r"^(?P<y>\d{4})-(?P<mo>\d{2})-(?P<d>\d{2})[Tt](?P<hh>\d{2}):"
    r"(?P<mi>\d{2}):(?P<sec>\d{2})(?P<frac>\.\d+)?"
    r"(?P<zone>[Zz]|[+-]\d{2}:\d{2})$"
)


def parse_ts3339(ts: pd.Series) -> pd.Series:
    """RFC3339 timestamp text -> datetime64[us] UTC-naive (NaT on fail).

    Reference: ParseTIMESTAMP3339, runtime/datetime.c:292. Offsets are
    normalized to UTC (the reference keeps the zone in struct syslogTime;
    our engine stores instants in UTC, session tz pinned to UTC).
    """
    g = fastre.extract(ts, _RE_TS3339)
    ok = g["y"].notna()
    out = pd.Series(pd.NaT, index=ts.index, dtype="datetime64[us]")
    if ok.any():
        frac = g.loc[ok, "frac"].fillna("")
        base = (
            g.loc[ok, "y"] + "-" + g.loc[ok, "mo"] + "-" + g.loc[ok, "d"]
            + " " + g.loc[ok, "hh"] + ":" + g.loc[ok, "mi"] + ":"
            + g.loc[ok, "sec"] + frac
        )
        parsed = pd.to_datetime(base, format="ISO8601", errors="coerce")
        zone = g.loc[ok, "zone"].str.upper()
        offs = pd.Series(pd.Timedelta(0), index=zone.index)
        has_off = zone != "Z"
        if has_off.any():
            sign = np.where(zone[has_off].str[0] == "-", -1, 1)
            hh = zone[has_off].str[1:3].astype(int)
            mm = zone[has_off].str[4:6].astype(int)
            offs[has_off] = pd.to_timedelta(sign * (hh * 60 + mm), unit="m")
            # offset ranges: hour 0-23, minute 0-59 (datetime.c:386-396)
            parsed[zone.index[has_off][(hh > 23) | (mm > 59)]] = pd.NaT
        out[ok] = (parsed - offs).astype("datetime64[us]")
    return out


def parse_5424(after_pri: pd.Series, recv_ts: pd.Series) -> pd.DataFrame:
    """Vectorized RFC5424 parse.

    Returns a DataFrame with the PARSED_STRUCT fields plus ``accepted``
    (bool: this parser claimed the row) and ``timereported``.
    """
    n = len(after_pri)
    s = after_pri.fillna("")
    accepted = fastre.startswith(s, "1 ")

    out = pd.DataFrame(
        {
            "accepted": accepted,
            "protocol_version": np.where(accepted, 1, 0),
            "timestamp_text": pd.Series([None] * n, dtype="object"),
            "hostname": pd.Series([None] * n, dtype="object"),
            "syslogtag": pd.Series([None] * n, dtype="object"),
            "app_name": pd.Series([None] * n, dtype="object"),
            "procid": pd.Series([None] * n, dtype="object"),
            "msgid": pd.Series([None] * n, dtype="object"),
            "structured_data": pd.Series([None] * n, dtype="object"),
            "msg": pd.Series([None] * n, dtype="object"),
            "timereported": pd.Series(pd.NaT, index=s.index, dtype="datetime64[us]"),
        },
        index=s.index,
    )
    if not accepted.any():
        return out

    g = fastre.extract(s[accepted], _RE_5424)
    matched = g["ts"].notna()
    # Rows passing the "1 " guard but failing the full header regex are
    # still owned by this parser (the guard decided, pmrfc5424.c:224-226);
    # their fields stay empty and MSG gets the remainder after "1 ".
    idx_ok = g.index[matched]
    out.loc[idx_ok, "timestamp_text"] = g.loc[idx_ok, "ts"]
    out.loc[idx_ok, "hostname"] = g.loc[idx_ok, "host"]
    out.loc[idx_ok, "app_name"] = g.loc[idx_ok, "app"]
    out.loc[idx_ok, "procid"] = g.loc[idx_ok, "procid"]
    out.loc[idx_ok, "msgid"] = g.loc[idx_ok, "msgid"]
    out.loc[idx_ok, "structured_data"] = g.loc[idx_ok, "sd"]
    out.loc[idx_ok, "msg"] = g.loc[idx_ok, "msg"].fillna("")

    idx_bad = g.index[~matched]
    if len(idx_bad):
        out.loc[idx_bad, "msg"] = s[idx_bad].str[2:]
        for c in ("hostname", "app_name", "procid", "msgid",
                  "structured_data", "timestamp_text"):
            out.loc[idx_bad, c] = "-"

    # TAG emulation (msg.c:2482-2514)
    app = out.loc[accepted, "app_name"].fillna("-")
    procid = out.loc[accepted, "procid"].fillna("-")
    tag = np.where(procid == "-", app, app + "[" + procid + "]")
    out.loc[accepted, "syslogtag"] = tag

    # timereported: parse RFC3339, '-' or unparsable -> reception time
    ts_txt = out.loc[accepted, "timestamp_text"].fillna("-")
    parsed = parse_ts3339(ts_txt)
    rec = recv_ts[accepted]
    out.loc[accepted, "timereported"] = parsed.where(parsed.notna(), rec)
    return out
