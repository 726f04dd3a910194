"""Message sanitization (SanitizeMsg, runtime/parser.c:379-570).

Semantics replicated (defaults as in the reference):

- drop one trailing NUL byte (parser.c:404-408)
- drop trailing LF (parser.c:415-421); bDropTrailingLF default on
- escape control characters as '#' + 3-digit OCTAL of the char code
  (parser.c:489-535, default mode with cCCEscapeChar '#'); TAB is a
  control char and is escaped too.
- 8-bit escaping and LF->space rewriting are off by default -> not applied.

Implementation note: 100% native expressions — NO Python in this path.
A conditional pandas UDF is a trap at scale: Spark extracts Python UDFs
out of CASE WHEN and evaluates them on EVERY row, so the "rare dirty
row" path would cost Arrow round-trips for the clean 99% too. Instead
the escape is a constant chain of 30 single-char replaces (one codegen'd
JVM pass each), gated behind one rlike so clean rows short-circuit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CTRL_RE = "[\\x00-\\x1f]"


def _escape_ctrl(col: Column) -> Column:
    """Chain of replace() calls: control char c -> '#%03o' % c
    (parser.c:528-534, octal mode with '#'). NUL/LF excluded — handled
    as trailing-strip before this (a mid-string NUL cannot survive C
    string handling; mid-string LF is escaped)."""
    out = col
    for c in range(0x20):
        if c == 0x00:
            continue
        out = F.replace(out, F.lit(chr(c)), F.lit("#%03o" % c))
    return out


def sanitize_expr(raw: Column) -> Column:
    """Sanitized form of a raw message column.

    Clean rows (the overwhelming majority) are the identity via a single
    rlike gate; a row without control chars has no trailing NUL/LF
    either (both are control chars)."""
    stripped = F.regexp_replace(raw, "\\x00$", "")
    stripped = F.regexp_replace(stripped, "\\n$", "")
    return F.when(raw.rlike(_CTRL_RE), _escape_ctrl(stripped)).otherwise(raw)


def with_sanitized(
    df: DataFrame, raw_col: str = "text", out: str = "rawmsg"
) -> DataFrame:
    """Add the sanitized ``rawmsg`` column (the canonical raw message:
    msg.h:79 pszRawMsg is stored *after* sanitization)."""
    return df.withColumn(out, sanitize_expr(F.col(raw_col)))
