"""Deterministic stratified sampling + weighted dataset mixing.

Training-data pipelines re-weight sources before training (temperature
sampling over domains/languages, epoch factors per corpus). Two
requirements shape the implementation:

- **Deterministic**: the sample must be a pure function of (doc id,
  salt) so re-runs, resumed runs, and audits see the same subset —
  ``df.sample()``'s RNG is partition-placement-dependent and fails all
  three. The selector is the top 8 hex digits of md5(salt || ':' || id)
  read as an integer h in [0, 2^32) — uniform, engine-independent, and
  EXACT (keep iff h < floor(rate * 2^32); integer compare, no float).
- **Scale**: both ops are per-row Column expressions (JVM codegen, no
  UDF, no shuffle). Upsampling materializes copies via explode of a
  bounded sequence — the copy count is floor(weight) + one Bernoulli
  unit, so a weight of 2.3 yields 2 or 3 copies per doc, expectation
  exactly 2.3, independent of partitioning.

A row's sampling hash and its mix hash use different salts — the two
decisions are independent, as separate epochs of randomness should be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1 << 32


def hash_int(col: Column, salt: str) -> Column:
    """Deterministic uniform integer in [0, 2^32): top 8 hex digits of
    md5(salt:value). Exact in any engine (integer, not float)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))),
                    1, 8),
        16, 10,
    ).cast("long")


def threshold(rate: float) -> int:
    """rate in [0,1] -> integer cutoff, the exact gate both engines
    compare against."""
    return int(rate * _SCALE)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
    keep_col: str = "samp_keep",
) -> DataFrame:
    """Append ``keep_col``: keep iff hash < floor(rate[stratum]*2^32).

    Per-stratum rates (e.g. downsample over-represented languages).
    Unknown strata fall to ``default_rate``. Pure projection — the
    filter pushes to the scan when the caller filters on it."""
    h = hash_int(F.col(id_col), salt)
    expr = F.lit(threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(threshold(rate))
        ).otherwise(expr)
    return df.withColumn(keep_col, h < expr)


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_weight: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """One output row per (doc, copy) with copy in [0, n_copies):
    n_copies = floor(w) + (hash < frac(w)) — deterministic epoch
    mixing with exact expectation w per doc. Weight 0 strata vanish
    (explode of an empty array drops the row)."""
    h = hash_int(F.col(id_col), salt)
    whole = F.lit(int(default_weight))
    frac_thr = F.lit(threshold(default_weight - int(default_weight)))
    for stratum, w in sorted(weights.items()):
        cond = F.col(strata_col) == stratum
        whole = F.when(cond, F.lit(int(w))).otherwise(whole)
        frac_thr = F.when(
            cond, F.lit(threshold(w - int(w)))
        ).otherwise(frac_thr)
    n = (whole + (h < frac_thr).cast("int")).alias("n")
    seq = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(seq))
