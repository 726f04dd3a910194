"""Skew handling: salting hot conv_ids (north rule, SURVEY §7.3).

rsyslog's analog is queue worker balancing (runtime/wtp.c); at
10^12-turn scale a hot conversation would pin one Spark partition, so:

- stateless stages (parse, filter, template, sink write) repartition on
  ``salt(conv_id)`` — uniform load, no semantic impact;
- order-sensitive windows stay keyed by un-salted conv_id (bounded by a
  single conversation's length, so the window partition is small even
  for hot convs — two-level strategy documented in SURVEY §7.3);
- AQE skew-join splitting is enabled globally (session.py) as the
  runtime safety net for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str = "conv_id", buckets: int = 32,
              out: str = "salt") -> DataFrame:
    """Deterministic salt: spreads each conv over ``buckets`` cells using
    the turn index (stable, no rand() — reruns partition identically)."""
    return df.withColumn(
        out, F.pmod(F.hash(F.col(key), F.col("turn_idx")), F.lit(buckets))
    )


def repartition_salted(
    df: DataFrame, key: str = "conv_id", buckets: int = 32,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition for stateless heavy stages: (conv_id, salt) spreads a
    hot conversation over ``buckets`` partitions."""
    salted = with_salt(df, key=key, buckets=buckets)
    cols = [F.col(key), F.col("salt")]
    if num_partitions:
        return salted.repartition(num_partitions, *cols)
    return salted.repartition(*cols)
