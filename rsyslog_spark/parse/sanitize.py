"""Message sanitization (SanitizeMsg, runtime/parser.c:379-570).

Semantics replicated (defaults as in the reference):

- drop one trailing NUL byte (parser.c:404-408)
- drop trailing LF (parser.c:415-421); bDropTrailingLF default on
- escape control characters as '#' + 3-digit OCTAL of the char code
  (parser.c:489-535, default mode with cCCEscapeChar '#'); TAB is a
  control char and is escaped too.
- 8-bit escaping and LF->space rewriting are off by default -> not applied.

Fast path: rows with no control characters are handled natively (stay in
codegen); only dirty rows cross into the Arrow UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CTRL_RE = "[\\x00-\\x1f]"

# char -> '#NNN' octal escape, for codes 0..31 (parser.c:528-534 octal mode)
_ESC_TABLE = {c: "#%03o" % c for c in range(0x20)}


def _sanitize_series(s: pd.Series) -> pd.Series:
    """Vectorized sanitize for rows known to contain control chars."""
    # trailing NUL then trailing LF, as the C code does in that order
    s = s.str.replace("\\x00$", "", regex=True)
    s = s.str.replace("\\n$", "", regex=True)
    dirty = s.str.contains(_CTRL_RE, regex=True, na=False)
    if dirty.any():
        s = s.copy()
        s[dirty] = s[dirty].map(
            lambda v: v.translate(_ESC_TABLE) if isinstance(v, str) else v
        )
    return s


@F.pandas_udf(T.StringType())
def _sanitize_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - thin
    return _sanitize_series(s)


def sanitize_expr(raw: Column) -> Column:
    """Sanitized form of a raw message column.

    Clean rows (the overwhelming majority) never leave the JVM: a single
    rlike gate routes only control-char rows through the Arrow UDF. A row
    without control chars has no trailing NUL/LF either (both are control
    chars), so the clean branch is the identity.
    """
    return F.when(raw.rlike(_CTRL_RE), _sanitize_udf(raw)).otherwise(raw)


def with_sanitized(
    df: DataFrame, raw_col: str = "text", out: str = "rawmsg"
) -> DataFrame:
    """Add the sanitized ``rawmsg`` column (the canonical raw message:
    msg.h:79 pszRawMsg is stored *after* sanitization)."""
    return df.withColumn(out, sanitize_expr(F.col(raw_col)))
