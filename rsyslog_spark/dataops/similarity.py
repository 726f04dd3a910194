"""Embedding similarity search over an array<float> column.

- ``cosine``: exact cosine as a pure Column expression (zip_with +
  aggregate in double precision — JVM codegen, no UDF).
- ``topk_bruteforce``: exact top-k neighbors for a (small) query set:
  broadcast the queries, scan the corpus once. This is the correct
  100 TB plan when |queries| is small — one pass, no shuffle of the
  corpus, per-partition top-k via window over the broadcast side.
- ``sign_lsh_buckets`` / ``topk_lsh``: the scale path for large query
  sets — deterministic sign-LSH buckets (bit = sign of coordinate
  projections summed per band), candidates only within a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (qid, nid, cos, rank). Queries are broadcast; the
    corpus is scanned once; rank via window partitioned by qid
    (bounded by |queries|*k rows after the per-partition filter)."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
    )
    scored = (
        c.join(broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact). Quadratic — correct
    only for small corpora or WITHIN LSH buckets; the scale path is
    ``topk_lsh``-style bucketing first."""
    a = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def sign_lsh_buckets(
    df: DataFrame,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Deterministic sign-LSH bucket id (bitstring).

    Bit j = sign of the sum of coordinates i with i % n_bits == j — a
    fixed axis-aligned projection family (deterministic without an RNG,
    reproducible across engines; a production variant would broadcast a
    seeded random hyperplane matrix)."""
    v = _dbl(F.col(vec_col))
    bits = []
    for j in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: F.when(i % n_bits == j, x).otherwise(F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn(out, F.concat(*bits))


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the sign-LSH bucket.

    The bucket equi-join replaces the all-pairs product — this is the
    shape that survives 10^9 vectors (bucket sizes ~n/2^bits; skewed
    buckets split by AQE)."""
    cb = sign_lsh_buckets(corpus, n_bits, id_col, vec_col)
    qb = sign_lsh_buckets(queries, n_bits, id_col, vec_col)
    q = qb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
                  "bucket")
    c = cb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
                  "bucket")
    scored = (
        c.join(broadcast(q), on="bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
