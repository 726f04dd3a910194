"""RainerScript scalar function library as Column helpers (SURVEY §2.5).

Registry reference: ``static struct scriptFunct functions[]``,
grammar/rainerscript.c:3730-3763. Each helper replicates the C semantics
(cited per function) as a pure Column expression — JVM-side, inside
whole-stage codegen; none of these is a Python UDF.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.coerce import rs_to_number, rs_to_string

FIELD_NOT_FOUND = "***FIELD NOT FOUND***"


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


# --- string basics ---------------------------------------------------------

def rs_strlen(s: Column) -> Column:
    """strlen(1) — rainerscript.c:2371."""
    return F.length(s)


def rs_substring(s: Column, start, length) -> Column:
    """substring(str, start, len), START IS 0-BASED — rainerscript.c:2398.
    Spark substr is 1-based, hence the +1."""
    return F.substring(s, _lit(start) + 1, _lit(length))


def rs_ltrim(s: Column) -> Column:
    """ltrim(1) — rainerscript.c:1994."""
    return F.ltrim(s)


def rs_rtrim(s: Column) -> Column:
    """rtrim(1) — rainerscript.c:2024."""
    return F.rtrim(s)


def rs_tolower(s: Column) -> Column:
    """tolower(1) — rainerscript.c:2093."""
    return F.lower(s)


def rs_cstr(v: Column) -> Column:
    """cstr(1): force string via var2String rules — rainerscript.c:2114."""
    return rs_to_string(v)


def rs_cnum(v: Column) -> Column:
    """cnum(1): force number via var2Number rules — rainerscript.c:2133."""
    return rs_to_number(v)


def rs_replace(s: Column, find: str, repl: str) -> Column:
    """replace(3): literal find/replace-all — rainerscript.c:2305
    (core doFuncReplace :1720)."""
    return F.replace(s, _lit(find), _lit(repl))


def rs_wrap(s: Column, wrapper: str, escaper: str | None = None) -> Column:
    """wrap(2/3): wrapper & str & wrapper; the 3-arg form first replaces
    occurrences of wrapper inside str with escaper — rainerscript.c:2322-2368."""
    body = F.replace(s, _lit(wrapper), _lit(escaper)) if escaper is not None else s
    return F.concat(_lit(wrapper), body, _lit(wrapper))


def rs_int2hex(n: Column) -> Column:
    """int2hex(1) — rainerscript.c:2277. C uses %x (lowercase)."""
    return F.lower(F.hex(n.cast("long")))


# --- field extraction ------------------------------------------------------

def rs_field(s: Column, delim: str | int, n) -> Column:
    """field(str, delim, n): n-th 1-based field; missing ->
    '***FIELD NOT FOUND***' — rainerscript.c:2422-2465 (helpers
    :1496-1594). delim is a char-code number or a string; consecutive
    delimiters yield empty fields (both C variants)."""
    d = chr(delim) if isinstance(delim, int) else delim
    parts = F.split(s, _re.escape(d))
    idx = _lit(n).cast("int")
    return F.coalesce(
        F.when(idx >= 1, F.get(parts, idx - 1)),
        F.lit(FIELD_NOT_FOUND),
    )


# --- regex -----------------------------------------------------------------

_POSIX_CLASSES = {
    "[:alnum:]": "\\p{Alnum}",
    "[:alpha:]": "\\p{Alpha}",
    "[:digit:]": "\\d",
    "[:space:]": "\\s",
    "[:upper:]": "\\p{Upper}",
    "[:lower:]": "\\p{Lower}",
    "[:punct:]": "\\p{Punct}",
    "[:xdigit:]": "\\p{XDigit}",
}


def posix_ere_to_java(pattern: str) -> str:
    """Translate the common POSIX-ERE subset to Java regex.

    The reference compiles POSIX ERE (initFunc_re_match_generic,
    rainerscript.c:3571-3607). Java regex is a superset for the common
    constructs; POSIX bracket classes need rewriting. BRE (the legacy
    ``regex`` property-filter op) back-references are a documented
    limitation (SURVEY §7.3)."""
    out = pattern
    for k, v in _POSIX_CLASSES.items():
        out = out.replace(k, v)
    return out


def rs_re_match(s: Column, pattern: str, case_insensitive: bool = False) -> Column:
    """re_match(2) / re_match_i(2) — rainerscript.c:2155; regex constant,
    compiled once (:3571-3607) ≙ Spark compiles rlike per task."""
    p = posix_ere_to_java(pattern)
    if case_insensitive:
        p = "(?i)" + p
    return s.rlike(p)


def rs_re_extract(
    s: Column,
    pattern: str,
    matchnbr: int,
    submatch: int,
    nomatch: str,
    case_insensitive: bool = False,
) -> Column:
    """re_extract(5) / re_extract_i(5) — rainerscript.c:1596-1688:
    find the matchnbr-th successive match (0-based), return capture
    group ``submatch`` (0 = whole match); no match -> param 5."""
    p = posix_ere_to_java(pattern)
    if case_insensitive:
        p = "(?i)" + p
    all_matches = F.regexp_extract_all(s, F.lit(p), submatch)
    got = F.get(all_matches, matchnbr)
    return F.coalesce(got, F.lit(nomatch))


# --- time ------------------------------------------------------------------

def rs_format_time(unixtime: Column, fmt: str) -> Column:
    """format_time(2) — rainerscript.c:2553-2610. Formats an int64
    unixtime as date-rfc3164 or date-rfc3339; NON-NUMBER input is
    returned as-is (string passthrough on bad input)."""
    num_ok = unixtime.cast("string").rlike("^-?[0-9]+$")
    t = F.timestamp_seconds(unixtime.cast("long"))
    if fmt == "date-rfc3164":
        # 'Mmm dd hh:mm:ss' with space-padded day ("Jan  5")
        formatted = F.concat(
            F.date_format(t, "MMM"),
            F.lit(" "),
            F.lpad(F.dayofmonth(t).cast("string"), 2, " "),
            F.lit(" "),
            F.date_format(t, "HH:mm:ss"),
        )
    elif fmt == "date-rfc3339":
        # engine runs pinned to UTC -> +00:00 offset form of the reference
        formatted = F.concat(
            F.date_format(t, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00")
        )
    else:
        raise ValueError(f"unknown format_time format {fmt!r}")
    return F.when(num_ok, formatted).otherwise(unixtime.cast("string"))


_TS3339_SQL = "yyyy-MM-dd'T'HH:mm:ss"


def rs_parse_time(s: Column) -> Column:
    """parse_time(1) — rainerscript.c:2636-2679: RFC3339 or RFC3164
    string -> unixtime; failure -> 0 (script_error is modeled by the
    0 return; rsyslog returns 0 value with error flag). RFC3164 year via
    estimateYear (:2620-2633) — here pinned to the engine run year
    parameter for determinism (SURVEY §7.3 '$now-family nondeterminism')."""
    t = rs_try_parse_ts(s)
    return F.coalesce(F.unix_timestamp(t), F.lit(0).cast("long"))


def rs_try_parse_ts(s: Column, default_year: int = 2024) -> Column:
    """Timestamp (or NULL) from RFC3339 / RFC3164 text."""
    # try_to_timestamp avoids failure on non-matching rows; optional
    # fraction and offset sections ([.SSS][XXX]) cover Z / ±hh:mm forms
    t3339 = F.try_to_timestamp(
        s, F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
    )
    m3164 = F.regexp_extract(s, r"^([A-Z][a-z]{2}) ( ?\d|\d\d) (\d{2}:\d{2}:\d{2})", 0)
    t3164 = F.try_to_timestamp(
        F.when(
            m3164 != "",
            F.concat(F.lit(f"{default_year} "), F.regexp_replace(m3164, "  ", " ")),
        ),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    return F.coalesce(t3339, t3164)


def rs_is_time(s: Column) -> Column:
    """is_time(1/2) — rainerscript.c:2682/2755: validity test."""
    return rs_try_parse_ts(s).isNotNull()


# --- ip --------------------------------------------------------------------

def rs_num2ipv4(n: Column) -> Column:
    """num2ipv4(1) — rainerscript.c:2814-2850: int -> dotted quad;
    non-number / out of [0, 2^32-1] -> '-1'."""
    v = rs_to_number(n)
    ok = n.cast("string").rlike("^-?[0-9]+$") & (v >= 0) & (v <= 4294967295)
    quad = F.concat_ws(
        ".",
        F.shiftright(v, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(v, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(v, 8).bitwiseAND(F.lit(255)).cast("string"),
        v.bitwiseAND(F.lit(255)).cast("string"),
    )
    return F.when(ok, quad).otherwise(F.lit("-1"))


def rs_ipv42num(s: Column) -> Column:
    """ipv42num(1) — rainerscript.c:2184-2270: dotted quad -> int64;
    malformed -> -1. Faithful quirks: optional surrounding spaces are
    allowed and octets are NOT range-checked (300.1.1.1 is 'valid')."""
    trimmed = F.trim(s)
    ok = trimmed.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    p = F.split(trimmed, r"\.")
    val = (
        F.get(p, 0).cast("long") * 16777216
        + F.get(p, 1).cast("long") * 65536
        + F.get(p, 2).cast("long") * 256
        + F.get(p, 3).cast("long")
    )
    return F.when(ok, val).otherwise(F.lit(-1).cast("long"))


# -- fmhash function module (contrib/fmhash/fmhash.c) -----------------------
# The sandbox models the NON-xxhash build (fmhash.c:75-149): hash32 =
# FNV-1 over uint32 with the seed as the starting value, hash64 =
# modified Bernstein (djb) over uint64 with the seed ADDED at the end.
# Both walk the UTF-8 BYTES of the string like the C loops — including
# djb's signed-char sign extension for bytes >= 0x80. The reference's
# own tests accept either build's values (content-pattern-check with
# two alternatives); these reproduce the non-xxhash alternative
# exactly (rscript_hash32/hash64 goldens).

_U32 = 0xFFFFFFFF


def _utf8_bytes(s: Column):
    """(hex-string, byte-count) of the UTF-8 encoding."""
    b = F.encode(F.coalesce(s, F.lit("")), "UTF-8")
    return F.hex(b), F.octet_length(b)


def _byte_at(hx: Column, i: Column) -> Column:
    """i-th (0-based) byte as 0..255 long, via the hex projection."""
    return F.conv(
        F.substring(hx, i * 2 + 1, 2), 16, 10
    ).cast("long")


def rs_hash32(s: Column, seed: Column | None = None) -> Column:
    """hash32(str[, seed]) — FNV-1, uint32 (fmhash.c:81-102)."""
    hx, n = _utf8_bytes(s)
    seed0 = (
        F.coalesce(seed, F.lit(0)).cast("long").bitwiseAND(F.lit(_U32))
        if seed is not None else F.lit(0).cast("long")
    )

    def step(acc, i):
        m = (
            acc + F.shiftleft(acc, 1) + F.shiftleft(acc, 4)
            + F.shiftleft(acc, 7) + F.shiftleft(acc, 8)
            + F.shiftleft(acc, 24)
        ).bitwiseAND(F.lit(_U32))
        return m.bitwiseXOR(_byte_at(hx, i))

    return F.when(n == 0, seed0).otherwise(
        F.aggregate(F.sequence(F.lit(0), n - 1), seed0, step)
    )


def rs_hash64(s: Column, seed: Column | None = None) -> Column:
    """hash64(str[, seed]) — modified Bernstein, uint64 wrap in Java
    long arithmetic; seed added after the loop (fmhash.c:112-125)."""
    hx, n = _utf8_bytes(s)

    # ANSI mode forbids wrapping long multiply, so 33*acc runs in
    # decimal space and wraps back to the signed-long bit pattern via
    # pmod 2^64 (the C's uint64 overflow semantics)
    two64 = F.lit(_U64_DEC).cast("decimal(38,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(38,0)")

    def step(acc, i):
        b = _byte_at(hx, i)
        # const char* walk: bytes >= 0x80 sign-extend before the XOR
        signed = F.when(b >= 128, b - 256).otherwise(b)
        m = F.pmod(acc.cast("decimal(38,0)") * 33, two64)
        wrapped = F.when(m >= two63, m - two64).otherwise(m).cast("long")
        return wrapped.bitwiseXOR(signed)

    h = F.when(n == 0, F.lit(5381).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), n - 1), F.lit(5381).cast("long"), step
        )
    )
    if seed is not None:
        s64 = F.coalesce(seed, F.lit(0)).cast("long").bitwiseAND(
            F.lit(_U32)
        )
        m = F.pmod(h.cast("decimal(38,0)") + s64, two64)
        h = F.when(m >= two63, m - two64).otherwise(m).cast("long")
    return h


_U64_DEC = "18446744073709551616"


def rs_hash_mod(h: Column, mod: Column) -> Column:
    """hashXXmod: UNSIGNED 64-bit modulo of a hash held in a signed
    long (negative values first lift by 2^64 in decimal space).
    mod <= 0 yields 0 (the C would be UB; fail-soft like the
    parser_warnmsg default-to-0 path)."""
    m = F.coalesce(mod.cast("long"), F.lit(0))
    u = F.when(
        h < 0,
        h.cast("decimal(21,0)")
        + F.lit(_U64_DEC).cast("decimal(21,0)"),
    ).otherwise(h.cast("decimal(21,0)"))
    return F.when(
        m > 0, (u % m.cast("decimal(21,0)")).cast("long")
    ).otherwise(F.lit(0).cast("long"))
