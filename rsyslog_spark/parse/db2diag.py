"""pmdb2diag — DB2 diagnostic-log field parser as pure Columns.

Reference walk (contrib/pmdb2diag/pmdb2diag.c:52-146, defaults
:157-162 levelpos=59 timepos=0 pidstarttoprogstartshift=49, timeformat
"%Y-%m-%d-%H.%M.%S." with sepSec = its last char):

- needs ``levelpos + 4`` post-PRI chars, else RS_RET_COULD_NOT_PARSE;
- severity from the FIRST char of the level word at ``levelpos``:
  C(ritical)->0/len8, A(lert)->1/len5, S(evere)->2/len6, E: next char
  'r' (Error)->3 else (Event)->5, len5, W(arning)->4/len7, I(nfo)->6/
  len4, D(ebug)->7/len5. An UNKNOWN level char hits
  ``ABORT_FINALIZE(0)`` — iRet 0 is RS_RET_OK, so the parser ACCEPTS
  the message with NO fields set (a reference quirk kept bug-for-bug:
  the chain stops, nothing downstream parses the line). A KNOWN level
  that leaves fewer than ``lvl_len`` chars is a real reject;
- timestamp at ``timepos`` via strptime(timeformat); on success the
  trailing digits are the second-fraction (value = int / 10^ndigits)
  and an optional [+-]N tz suffix is MINUTES offset (sscanf "%d+%d";
  the reference stores OffsetHour=N/60, OffsetMinute=N%60 — total N
  minutes). We store UTC (local - offset for '+'), the engine-wide
  timestamp convention. strptime failure just leaves the timestamp
  unset — not a reject;
- PROCID: chars between the first ": " after the level word and the
  next space. The C searches from ``pszRawMsg + levelpos`` WITHOUT
  offAfterPRI — indistinguishable here because db2diag files carry no
  PRI (offAfterPRI 0); this parser operates on the post-PRI text like
  every chain branch. A missing ':' is ABORT_FINALIZE(0) again:
  accepted, severity/timestamp only;
- APP-NAME: from pid_start + ``pidstarttoprogstartshift`` to the first
  ' ' or '\\\\' (whichever first) or end of message.

Only the strptime directives %Y %m %d %H %M %S (plus literal chars)
are supported in ``timeformat`` — anything else raises at compile time
rather than silently mis-parsing.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STRP = {
    "Y": r"(\d{4})",
    "m": r"(\d{2})",
    "d": r"(\d{2})",
    "H": r"(\d{2})",
    "M": r"(\d{2})",
    "S": r"(\d{2})",
}

# (severity, level-word length) by first char; 'E' resolved separately
_LVL = {"C": (0, 8), "A": (1, 5), "S": (2, 6), "W": (4, 7),
        "I": (6, 4), "D": (7, 5)}


def _fmt_to_regex(fmt: str) -> tuple[str, list[str]]:
    """strptime format -> (anchored regex, directive order)."""
    out, order, i = [], [], 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            d = fmt[i + 1] if i + 1 < len(fmt) else ""
            if d not in _STRP:
                raise ValueError(
                    f"pmdb2diag timeformat: unsupported directive %{d} "
                    "(supported: %Y %m %d %H %M %S)"
                )
            out.append(_STRP[d])
            order.append(d)
            i += 2
        else:
            out.append(_re.escape(ch))
            i += 1
    return "".join(out), order


def parse_db2diag(
    df: DataFrame,
    text_col: str = "text",
    levelpos: int = 59,
    timepos: int = 0,
    timeformat: str = "%Y-%m-%d-%H.%M.%S.",
    pid_shift: int = 49,
    prefix: str = "db2_",
) -> DataFrame:
    """Adds ``<prefix>ok / severity / ts / procid / appname``.

    ok mirrors the C return value: false ONLY when the message is
    shorter than levelpos+4, or the level word is known but truncated.
    Fields are independently nullable past that, matching the
    ABORT_FINALIZE(0) early-outs."""
    fmt_re, order = _fmt_to_regex(timeformat)
    # full time pattern: format + fraction digits + optional [+-]mins
    tpat = "^" + fmt_re + r"(\d*)([+-]\d+)?"
    ngroups = len(order)

    s = F.coalesce(F.col(text_col), F.lit(""))
    slen = F.length(s)
    lvl1 = F.substring(s, levelpos + 1, 1)
    lvl2 = F.substring(s, levelpos + 2, 1)

    sev = F.lit(None).cast("int")
    lvl_len = F.lit(None).cast("int")
    for ch, (sv, ln) in _LVL.items():
        sev = F.when(lvl1 == ch, F.lit(sv)).otherwise(sev)
        lvl_len = F.when(lvl1 == ch, F.lit(ln)).otherwise(lvl_len)
    sev = F.when(lvl1 == "E",
                 F.when(lvl2 == "r", F.lit(3)).otherwise(F.lit(5))
                 ).otherwise(sev)
    lvl_len = F.when(lvl1 == "E", F.lit(5)).otherwise(lvl_len)

    long_enough = slen >= levelpos + 4
    known = sev.isNotNull()
    full_level = known & (slen >= levelpos + lvl_len)
    # reject: too short outright, or known-but-truncated level word
    ok = long_enough & (~known | full_level)

    # --- timestamp ---
    tsub = F.substring(s, timepos + 1, 2_000_000)

    def g(i: int) -> Column:
        return F.regexp_extract(tsub, tpat, i)

    parts = {d: g(i + 1).try_cast("int") for i, d in enumerate(order)}
    frac_s = g(ngroups + 1)
    tz_s = g(ngroups + 2)
    matched = tsub.rlike(tpat)
    frac = F.when(frac_s == "", F.lit(0.0)).otherwise(
        frac_s.try_cast("double")
        / F.pow(F.lit(10.0), F.length(frac_s))
    )
    # tz suffix is MINUTES (sscanf "%d+%d" -> OffsetHour=N/60 + N%60)
    tz_min = F.when(tz_s == "", F.lit(0)).otherwise(
        F.substring(tz_s, 2, 100).try_cast("int")
        * F.when(F.substring(tz_s, 1, 1) == "-", -1).otherwise(1)
    )
    ts_local = F.try_make_timestamp(
        parts.get("Y", F.lit(None).cast("int")),
        parts.get("m", F.lit(None).cast("int")),
        parts.get("d", F.lit(None).cast("int")),
        parts.get("H", F.lit(0)),
        parts.get("M", F.lit(0)),
        parts.get("S", F.lit(0)).cast("double") + frac,
    )
    # unix_timestamp drops sub-seconds; rebuild exactly from epoch math
    ts = F.when(
        matched,
        F.timestamp_micros(
            (F.unix_timestamp(F.date_trunc("second", ts_local))
             - tz_min * 60).cast("long") * 1_000_000
            + F.round(frac * 1_000_000).cast("long")
        ),
    )

    def _locate(needle: str, start: Column) -> Column:
        # F.locate only accepts an int start; the SQL function takes a
        # column — call it directly
        return F.call_function("locate", F.lit(needle), s, start)

    # --- PROCID ---
    colon = _locate(":", F.lit(levelpos + 1) + lvl_len)
    pid_start = colon + 2
    pid_sp = _locate(" ", pid_start)
    procid = F.when(
        full_level & (colon > 0) & (pid_sp > 0),
        F.substring(s, pid_start, pid_sp - pid_start),
    )

    # --- APP-NAME ---
    prog_start = pid_start + F.lit(pid_shift)
    eprog = _locate(" ", prog_start)
    bslash = _locate("\\", prog_start)
    stop = F.when(
        (eprog > 0) & ((bslash == 0) | (eprog < bslash)), eprog
    ).when(bslash > 0, bslash).otherwise(slen + 1)
    appname = F.when(
        full_level & (colon > 0) & (prog_start <= slen),
        F.substring(s, prog_start, stop - prog_start),
    )

    return (
        df.withColumn(f"{prefix}ok", ok)
        .withColumn(f"{prefix}severity", F.when(full_level, sev))
        .withColumn(f"{prefix}ts", F.when(full_level, ts))
        .withColumn(f"{prefix}procid", procid)
        .withColumn(f"{prefix}appname", appname)
    )
