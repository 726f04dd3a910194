"""RainerScript dynamic-coercion semantics as Column helpers (SURVEY §1.2).

The reference type system (grammar/rainerscript.h:61-71) has exactly int64
and string at runtime; coercion is total and never errors:

- string→number (``str2num`` / ``var2Number``, grammar/rainerscript.c:1412):
  optional leading '-', then decimal digits; conversion SUCCEEDS only if the
  ENTIRE string is digits; empty string → 0 (success). On failure → 0.
- number→string (``var2String``, rainerscript.c:1432): decimal rendering.
- division by zero yields 0 (rainerscript.c:3000-3005 COMP_NUM_BINOP_DIV
  comment; applies to / and %).

These helpers replicate that exactly so filter/expression results match the
reference row for row. All are pure Column expressions (JVM-side, codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM_RE = "^-?[0-9]+$"


def rs_to_number(col: Column) -> Column:
    """string→int64 with rsyslog semantics: whole-string digits or 0.

    Empty string → 0; NULL → 0 (JSON NULL→0, rainerscript.c:1419-1420).
    Boolean-TYPED engine columns (parse_success — 'N' 0/1 in the
    reference) must be cast to int BEFORE they reach this generic
    coercion (done at the property-resolution boundary,
    config.py prop_column): a string var whose *content* is 'true' is
    just a non-numeric string and yields 0, exactly like var2Number.
    """
    c = col.cast("string")
    return (
        F.when(c.isNull() | (c == ""), F.lit(0).cast("long"))
        .when(c.rlike(_NUM_RE), c.cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )


def rs_to_string(col: Column) -> Column:
    """number→string decimal rendering; NULL → '' (rainerscript.c:1441-1450)."""
    return F.coalesce(col.cast("string"), F.lit(""))


def rs_is_number(col: Column) -> Column:
    """True iff the string converts *fully* to a number (str2num success).

    Used by the mixed-type comparison rules (rainerscript.c:3056-3177):
    string side compares numerically only when fully numeric.
    """
    c = col.cast("string")
    return c.isNotNull() & ((c == "") | c.rlike(_NUM_RE))


def rs_div(num: Column, den: Column) -> Column:
    """Integer division with div-by-zero → 0 (rainerscript.c:3000-3005)."""
    n, d = num.cast("long"), den.cast("long")
    return F.when(d == 0, F.lit(0).cast("long")).otherwise(
        (n / d).cast("long")
    )


def rs_mod(num: Column, den: Column) -> Column:
    """Modulo with mod-by-zero → 0 (same guard as rs_div)."""
    n, d = num.cast("long"), den.cast("long")
    return F.when(d == 0, F.lit(0).cast("long")).otherwise(n % d)
