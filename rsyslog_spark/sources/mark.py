"""immark: periodic '-- MARK --' heartbeat rows (plugins/immark/
immark.c:55-63,201-203: one mark message every MarkMessagePeriod
seconds, default 1200, text '-- MARK --').

Batch analog over EVENT time: one mark row per elapsed period across
the table's timestamp span — exactly the rows the daemon would have
injected while those events arrived. The generation is a single
min/max aggregate + a sequence explode (no driver loop); the marks
union back with the input so downstream routing sees them as ordinary
messages (facility 'syslog'/pri 46 like the daemon's internal
messages; MARK-flag consumers filter on the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARK_TEXT = "-- MARK --"
DEFAULT_MARK_PERIOD = 1200  # immark.c:55


def mark_rows(
    df: DataFrame,
    period_s: int = DEFAULT_MARK_PERIOD,
    text: str = MARK_TEXT,
    ts_col: str = "ts",
) -> DataFrame:
    """(ts, text) mark rows at every period boundary inside the span
    (lo, hi] of ``df[ts_col]``."""
    bounds = df.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    )
    k_lo = (F.unix_timestamp("lo") / period_s).cast("long") + 1
    k_hi = (F.unix_timestamp("hi") / period_s).cast("long")
    return (
        bounds.select(
            F.explode(
                F.when(k_hi >= k_lo, F.sequence(k_lo, k_hi)).otherwise(
                    F.array().cast("array<long>")
                )
            ).alias("k")
        )
        .select(
            (F.col("k") * period_s).cast("timestamp").alias(ts_col),
            F.lit(text).alias("text"),
        )
    )


def with_marks(
    df: DataFrame,
    period_s: int = DEFAULT_MARK_PERIOD,
    text: str = MARK_TEXT,
    ts_col: str = "ts",
    conv_id: str = "--mark--",
) -> DataFrame:
    """Union the input with mark rows shaped to the transcript schema
    (role 'system', empty tool, turn_idx by mark order)."""
    marks = mark_rows(df, period_s, text, ts_col)
    from pyspark.sql import Window

    w = Window.orderBy(ts_col)
    shaped = marks.select(
        F.lit(conv_id).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("system").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.col(ts_col),
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", ts_col]
    return df.select(*cols).unionByName(shaped)
