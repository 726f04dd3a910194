"""pmciscoios + pmnull parser dialects as pure-Column parsers.

- ``parse_ciscoios``: Cisco IOS "syslog" format
  (plugins/pmciscoios/pmciscoios.c:146-265):

      <seqno>: [origin: ][*|.]TIMESTAMP3164[: ]%TAG: msg

  The C walk requires, in order: a (possibly empty) decimal message
  counter terminated by EXACTLY ": " (a line starting "*Mar  1 ..."
  with no counter therefore FAILS, as in the reference); an optional
  ORIGIN up to the FIRST ": " when ``present.origin`` is on
  (pmciscoios.c:177-192); one optional '*' or '.' NTP-sync flag
  (pmciscoios.c:214); the 3164 timestamp in datetime.c:450's extended
  grammar ``[yyyy ]Mon (d)d[ yyyy] hh:mm:ss[.subsec][ TZSTRING][:]``
  (year at most once — twice flags the stamp invalid, datetime.c:452;
  TZSTRING names resolve through the daemon's configured timezone
  table, which is EMPTY by default, so an unknown name is parsed and
  ignored, datetime.c:734-736 — we surface it in the ``cisco_tz``
  column and likewise apply no offset); then the tag, which MUST
  begin '%' and run to ": " — the TAG value keeps both the '%' and
  the trailing ':' (pmciscoios.c:238-257) and MSG begins with the
  delimiter's space (MsgSetMSGoffs after a single ++).

  ``present.xr`` (pmciscoios.c:197-234, 248) adds two skips — to the
  first ':' before the timestamp (the "RP/0/RSP0/CPU0:" route-
  processor prefix) and to the first '%' after it (the process name,
  e.g. "pim[1000]: ") — and shifts the tag terminator by one char, so
  XR tags read "%TAG : msg". Goldens are hand-derived from the C walk
  (no reference shell fixture exists for XR).

  The parser is declared AutomaticPRIParsing-compatible in the
  reference, so it operates on the post-PRI text — strip PRI with
  parse/pri.py first, exactly like the other chain branches.

  Year estimation: the in-band year is used when present; otherwise
  the reception-time year with the Dec/Jan rollover rule
  (datetime.c:465 ff.), same convention as the pm3164 cascade.

  All fields come from JVM-side regexp extracts over the short header
  (whole-stage codegen; no Python).

- ``parse_null``: pmnull (plugins/pmnull/pmnull.c:152-160): TAG :=
  configured tag (default empty), PRI := facility*8 + severity
  (defaults 1/5 -> 13, "as of rfc3164"), and MSG := the ENTIRE raw
  input from offset 0 — INCLUDING any "<pri>" prefix
  (MsgSetMSGoffs(pMsg, 0); golden: tests/pmnull-basic.sh expects
  ``msg: <189>16261: ...``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTHS_ALT = "|".join(_MONTHS)

# group numbers in _pattern(): 1 seq, 2 origin (or absent), then
# 3 y1, 4 mon, 5 day, 6 y2, 7 h, 8 mi, 9 s, 10 subsec, 11 tz,
# 12 tagbody, 13 msg  (origin shifts groups by 1 when present)
_TS = (
    r"(?:(\d{4}) )?(" + _MONTHS_ALT + r") ( ?\d|\d\d)(?: (\d{4}))? "
    r"(\d\d):(\d\d):(\d\d)(?:\.(\d+))?(?: ([^: ]+))?:? "
)
_TAIL = r"%([^: ]*): ([\s\S]*)$"


def _pattern(present_origin: bool, present_xr: bool = False) -> str:
    # origin is * not +: the C loop (pmciscoios.c:177-185) exits
    # immediately on a leading ": " and the delimiter check only needs
    # *(p2parse+1)==' ', so an EMPTY origin ("20: : May ...") parses
    origin = r"((?:(?!: )[\s\S])*): " if present_origin else ""
    # XR RSP pre-skip (pmciscoios.c:197-210): everything up to the
    # FIRST ':' is discarded, then exactly the ':' is consumed (no
    # space — XR lines read "RP/0/RSP0/CPU0:Dec 13 ..."). [^:]* cannot
    # cross a colon, so the regex stops at the first one just like the
    # C scan — no backtracking ambiguity.
    xr_pre = r"[^:]*:" if present_xr else ""
    if present_xr:
        # post-timestamp XR skip to the first '%' (pmciscoios.c:225-
        # 234), then the tag terminator: the copy loop stops at ':' or
        # ' ', XR skips ONE extra char (p2parse++ at :248) and THEN
        # requires ": " — i.e. "%TAG : msg" (a plain "%TAG: msg" FAILS
        # under XR because the skipped char eats the ':')
        tail = r"[^%]*%([^: ]*)[: ]: ([\s\S]*)$"
    else:
        tail = _TAIL
    return r"^(\d*): " + origin + xr_pre + r"[*.]?" + _TS + tail


def parse_ciscoios(
    df: DataFrame,
    text_col: str = "text",
    present_origin: bool = False,
    present_xr: bool = False,
    recv_ts_col: str = "ts",
    prefix: str = "cisco_",
) -> DataFrame:
    """Adds ``<prefix>ok`` plus seq/origin/ts/tz/tag/msg columns; rows
    that fail any step of the reference walk get ok=false and NULL
    fields (RS_RET_COULD_NOT_PARSE — the chain driver moves on)."""
    pat = _pattern(present_origin, present_xr)
    off = 1 if present_origin else 0
    s = F.coalesce(F.col(text_col), F.lit(""))

    def g(i: int) -> Column:
        return F.regexp_extract(s, pat, i)

    matched = s.rlike(pat)
    y1, mon, day, y2 = g(2 + off), g(3 + off), g(4 + off), g(5 + off)
    h, mi, sec, sub = g(6 + off), g(7 + off), g(8 + off), g(9 + off)
    # try_cast: non-matching rows extract '' (ANSI cast would throw);
    # null propagates through the checks and coalesces to ok=false
    day_n = F.ltrim(day).try_cast("int")
    # zero digits before ': ' -> counter 0 (C init value); a counter
    # too large for int64 is a parse FAILURE, not a silent 0 (the C
    # walk wraps silently — failing loudly is the safer divergence)
    seq = F.when(g(1) == "", F.lit(0).cast("long")).otherwise(
        g(1).try_cast("long")
    )
    # year may occur ONCE (before month or after day); both -> invalid
    ok = F.coalesce(
        matched
        & seq.isNotNull()
        & ~((y1 != "") & (y2 != ""))
        & day_n.between(1, 31)
        & (h.try_cast("int") <= 23)
        & (mi.try_cast("int") <= 59)
        & (sec.try_cast("int") <= 60),  # leap second, datetime.c
        F.lit(False),
    )
    mon_n = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), mon
    ).cast("int")
    recv = F.col(recv_ts_col)
    est_year = (
        F.year(recv)
        + F.when((mon_n == 12) & (F.month(recv) == 1), -1)
        .when((mon_n == 1) & (F.month(recv) == 12), 1)
        .otherwise(0)
    )
    year = F.coalesce(
        y1.try_cast("int"), y2.try_cast("int"), est_year
    )
    frac = F.when(
        sub == "", F.lit(0.0)
    ).otherwise(
        F.concat(F.lit("0."), sub).try_cast("double")
    )
    ts = F.try_make_timestamp(
        year, mon_n, day_n,
        h.try_cast("int"), mi.try_cast("int"),
        sec.try_cast("int") + frac,
    )
    null_s = F.lit(None).cast("string")
    out = (
        df.withColumn(f"{prefix}ok", ok)
        .withColumn(f"{prefix}seq", F.when(ok, seq))
        .withColumn(
            f"{prefix}origin",
            F.when(ok & F.lit(present_origin), g(2)).otherwise(null_s),
        )
        .withColumn(f"{prefix}ts", F.when(ok, ts))
        .withColumn(
            f"{prefix}tz",
            F.when(ok, F.nullif(g(10 + off), F.lit(""))),
        )
        .withColumn(
            f"{prefix}tag",
            F.when(ok, F.concat(F.lit("%"), g(11 + off), F.lit(":"))),
        )
        .withColumn(
            f"{prefix}msg",
            F.when(ok, F.concat(F.lit(" "), g(12 + off))),
        )
    )
    return out


def parse_null(
    df: DataFrame,
    text_col: str = "text",
    tag: str | None = None,
    syslogfacility: int = 1,
    syslogseverity: int = 5,
) -> DataFrame:
    """pmnull: never fails; fixed tag/PRI, msg = full raw input."""
    return (
        df.withColumn("null_tag", F.lit(tag if tag is not None else ""))
        .withColumn(
            "null_pri",
            F.lit(syslogfacility * 8 + syslogseverity).cast("int"),
        )
        .withColumn("null_msg", F.coalesce(F.col(text_col), F.lit("")))
    )
