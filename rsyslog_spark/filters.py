"""Filter operators (SURVEY §2.3).

1. BSD PRI selectors (``*.info;mail.none``) — decoded to a 25-entry
   severity bitmask per facility exactly as ``DecodePRIFilter``
   (runtime/conf.c:350-478); executed as ``pmask[fac] & (1<<sev)``
   (runtime/ruleset.c:420-442). The mask is compiled ONCE at pipeline
   build time (the reference compiles at config load, SURVEY §3.1) and
   becomes a constant array literal — Catalyst constant-folds the whole
   predicate, no join, no UDF.

2. Property filters (``:msg, contains, "x"``) — ops decoded in
   grammar/rainerscript.c:249-337, executed by evalPROPFILT
   (runtime/ruleset.c:446-535).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TABLE_NOPRI = 0
TABLE_ALLPRI = 255
_NONE = -2  # INTERNAL_NOPRI stand-in
_ALL = -3   # '*' priority (TABLE_ALLPRI marker in decode)

# decodeSyslogName tables (runtime/conf.c syslogPriNames/syslogFacNames,
# classic sysklogd names incl. aliases)
PRI_NAMES = {
    "emerg": 0, "panic": 0,
    "alert": 1,
    "crit": 2,
    "err": 3, "error": 3,
    "warning": 4, "warn": 4,
    "notice": 5,
    "info": 6,
    "debug": 7,
    "none": _NONE,
    "*": _ALL,
}
FAC_NAMES = {
    "kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4,
    "security": 4, "syslog": 5, "lpr": 6, "news": 7, "uucp": 8,
    "cron": 9, "authpriv": 10, "ftp": 11, "ntp": 12, "audit": 13,
    "alert": 14, "clock": 15,
    "local0": 16, "local1": 17, "local2": 18, "local3": 19,
    "local4": 20, "local5": 21, "local6": 22, "local7": 23,
}
N_FAC = 25  # 0..23 + LOG_FAC_INVLD=24 (LOG_NFACILITIES, rsyslog.h:218)


def compile_prifilt(selector: str) -> list[int]:
    """Selector string -> 25-entry severity bitmask (conf.c:350-478)."""
    pmask = [TABLE_NOPRI] * N_FAC
    for part in selector.split(";"):
        part = part.strip()
        if not part:
            continue
        if "." not in part:
            raise ValueError(f"bad PRI selector element {part!r}")
        fac_list, pri_name = part.rsplit(".", 1)
        pri_name = pri_name.strip()
        ignorepri = pri_name.startswith("!")
        if ignorepri:
            pri_name = pri_name[1:]
        singlpri = pri_name.startswith("=")
        if singlpri:
            pri_name = pri_name[1:]
        if pri_name not in PRI_NAMES:
            raise ValueError(f"unknown priority name {pri_name!r}")
        pri = PRI_NAMES[pri_name]

        facs: list[int]
        if fac_list.strip() == "*":
            facs = list(range(N_FAC))
        else:
            facs = []
            for fname in fac_list.split(","):
                fname = fname.strip()
                if fname not in FAC_NAMES:
                    raise ValueError(f"unknown facility name {fname!r}")
                facs.append(FAC_NAMES[fname])

        for f in facs:
            if pri == _NONE:
                pmask[f] = TABLE_ALLPRI if ignorepri else TABLE_NOPRI
            elif singlpri:
                if ignorepri:
                    pmask[f] &= ~(1 << pri) & 0xFF
                else:
                    pmask[f] |= 1 << pri
            elif pri == _ALL:
                pmask[f] = TABLE_NOPRI if ignorepri else TABLE_ALLPRI
            else:
                bits = (1 << (pri + 1)) - 1  # severities 0..pri
                if ignorepri:
                    pmask[f] &= ~bits & 0xFF
                else:
                    pmask[f] |= bits
    return pmask


def prifilt_predicate(
    selector_or_mask: str | list[int],
    facility: Column,
    severity: Column,
) -> Column:
    """Boolean Column: pmask[facility] & (1<<severity) != 0
    (ruleset.c:420-442). Compiles to element_at on a constant array —
    pure codegen, broadcast-free."""
    mask = (
        compile_prifilt(selector_or_mask)
        if isinstance(selector_or_mask, str)
        else list(selector_or_mask)
    )
    arr = F.array(*[F.lit(int(m)) for m in mask])
    pow2 = F.array(*[F.lit(1 << b) for b in range(8)])
    return (
        F.element_at(arr, facility + 1).bitwiseAND(F.element_at(pow2, severity + 1))
        != 0
    )


def prifilt_and(a: list[int], b: list[int]) -> list[int]:
    """Mask algebra (cnfexprOptimize, rainerscript.c:4843-4880)."""
    return [x & y for x, y in zip(a, b)]


def prifilt_or(a: list[int], b: list[int]) -> list[int]:
    return [x | y for x, y in zip(a, b)]


def prifilt_not(a: list[int]) -> list[int]:
    return [~x & 0xFF for x in a]


# --- property filters (:prop, op, "value") -------------------------------

_PROP_OPS = ("contains", "isequal", "isempty", "startswith", "regex", "ereregex")


def bre_to_java(pattern: str) -> str:
    """POSIX BRE -> Java regex for the legacy ``regex`` propfilt op.

    The reference compiles ``regex`` with regcomp(3) WITHOUT
    REG_EXTENDED (ruleset.c:446-535 via objUse(regexp) — BRE dialect),
    so a pattern written for it means:

    - ``\\(``/``\\)`` group, bare ``(``/``)`` literal
    - ``\\{``/``\\}`` interval, bare ``{``/``}`` literal
    - bare ``+``/``?``/``|`` LITERAL (GNU ``\\+``/``\\?``/``\\|`` keep
      their operator meaning, matching glibc)
    - ``.`` ``*`` ``[]`` ``^`` ``$`` as usual

    Back-references (``\\1``) have no Java-pushdown-safe equivalent in
    the rlike path and are rejected loudly, like the BSD-selector
    precedent (rsconf.c:519-536 error-not-silent policy).
    """
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in "(){}":
                out.append(nxt)  # escaped -> operator in BRE
            elif nxt in "+?|":
                out.append(nxt)  # GNU extension: \+ \? \| operators
            elif nxt.isdigit():
                raise ValueError(
                    f"BRE back-reference \\{nxt} in {pattern!r} is not "
                    "supported by the Spark rlike path (regex dialect "
                    "limitation; use ereregex without back-references)"
                )
            else:
                out.append("\\" + nxt)
            i += 2
            continue
        if ch in "(){}+?|":
            out.append("\\" + ch)  # bare -> literal in BRE
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def propfilt_predicate(
    prop: Column, op: str, value: str | None = None, negate: bool = False
) -> Column:
    """Property-filter ops of evalPROPFILT (ruleset.c:446-535).

    The reference compares against the string form of the property; NULL
    properties behave as "" (propertyValue default, msg.c getProp).
    ``regex`` is POSIX BRE (translated token-by-token via
    :func:`bre_to_java`; back-references rejected loudly), ``ereregex``
    POSIX ERE (Java regex common subset, passed through).
    """
    s = F.coalesce(prop.cast("string"), F.lit(""))
    if op == "contains":
        c = s.contains(value)
    elif op == "isequal":
        c = s == value
    elif op == "isempty":
        c = s == ""
    elif op == "startswith":
        c = s.startswith(value)
    elif op == "regex":
        c = s.rlike(bre_to_java(value))
    elif op == "ereregex":
        c = s.rlike(value)
    else:
        raise ValueError(f"unknown property-filter op {op!r}; one of {_PROP_OPS}")
    return ~c if negate else c
