"""Aggregation operators: rsyslog's streaming counters as batch groupBys.

The reference has no GROUP BY; its aggregations are counters
(SURVEY §2.9): dynstats buckets (runtime/dynstats.c, 626 LoC), statsobj /
impstats (runtime/statsobj.c, plugins/impstats), mmcount, mmsequence.
Each maps to a declarative Spark aggregation that Catalyst executes with
map-side partial aggregation — the distributed generalization of the
reference's per-worker counters merged at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dyn_inc(
    df: DataFrame,
    bucket: str,
    key,
    max_cardinality: int = 0,
) -> DataFrame:
    """dynstats bucket + dyn_inc(bucket, key) (rainerscript.c:2531-2550,
    runtime/dynstats.c). Returns (name, key, count [, ops_overflow]).

    maxCardinality: keys beyond the cap are not tracked individually but
    counted in ``ops_overflow`` (dynstats.c:517). In batch, 'first N
    distinct keys seen' is nondeterministic under parallelism, so the cap
    keeps the TOP-N keys by count (deterministic, documented deviation;
    ties broken by key) — overflow counts preserved exactly.
    """
    keyed = df.select(F.lit(bucket).alias("name"), key.alias("key") if not isinstance(key, str) else F.col(key).alias("key"))
    counts = keyed.groupBy("name", "key").count()
    if max_cardinality and max_cardinality > 0:
        w = Window.partitionBy("name").orderBy(F.desc("count"), F.asc("key"))
        ranked = counts.withColumn("_rk", F.row_number().over(w))
        kept = ranked.filter(F.col("_rk") <= max_cardinality).drop("_rk")
        overflow = (
            ranked.filter(F.col("_rk") > max_cardinality)
            .groupBy("name")
            .agg(F.sum("count").alias("count"))
            .withColumn("key", F.lit("ops_overflow"))
            .select("name", "key", "count")
        )
        return kept.unionByName(overflow)
    return counts


def mm_count(df: DataFrame, app_col: str = "programname", key_col: str = "syslogseverity") -> DataFrame:
    """mmcount (contrib/mmcount/mmcount.c): messages per app per key."""
    return df.groupBy(app_col, key_col).count()


def mm_sequence(df: DataFrame, partition_by: str | None = None,
                order_by: tuple = ("conv_id", "turn_idx"),
                out: str = "sequence") -> DataFrame:
    """mmsequence (contrib/mmsequence): monotonically numbered messages.

    The reference numbers in arrival order; our total order is the
    stable (conv_id, turn_idx) window (north rule)."""
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(*order_by)
    else:
        w = Window.orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w))


def impstats(
    df: DataFrame,
    actions_counts: dict[str, int] | None = None,
) -> DataFrame:
    """impstats/statsobj analog (runtime/statsobj.h:47-52): engine
    counters as rows. Emitted per run into the metrics table
    (SURVEY §2.1 impstats row)."""
    spark = df.sparkSession
    core = df.agg(
        F.count(F.lit(1)).alias("submitted"),
        F.sum((~F.col("parse_success")).cast("long")).alias("parse_failures"),
        F.sum(F.col("parse_success").cast("long")).alias("processed"),
    ).first()
    rows = [
        ("core.submitted", int(core["submitted"] or 0)),
        ("core.parse_failures", int(core["parse_failures"] or 0)),
        ("core.processed", int(core["processed"] or 0)),
    ]
    for sink, n in (actions_counts or {}).items():
        rows.append((f"action.{sink}.processed", n))
    return spark.createDataFrame(rows, "counter string, value long")


def per_sink_counts_sql(df: DataFrame, preds: dict[str, str]) -> DataFrame:
    """Exact per-sink counts from predicate columns in one pass."""
    return df.agg(
        *[F.sum(F.col(p).cast("long")).alias(s) for s, p in preds.items()]
    )
