"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set, score every (query, candidate) pair with a
  JVM-side fold, rank per query.  Exact; cost O(|Q|·N·d).  At 100 TB
  the candidate scan is embarrassingly parallel and the broadcast keeps
  it shuffle-free until the final per-query top-k (a tiny shuffle of
  k·|Q| rows thanks to the rank-filter pushdown).
- **sign-LSH bucketed** — the scale path: hash vectors into 2^b
  coordinate-hyperplane sign buckets, join queries to candidates within
  the same bucket only.  Recall < 1, cost ∝ bucket occupancy.  (A
  production variant uses random hyperplanes; coordinate planes keep
  the oracle deterministic without a seeded RNG.)

Arithmetic contract: element-wise fold over doubles in index order —
bit-identical to DuckDB's ``list_dot_product`` (verified empirically),
so exact-threshold comparisons are portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_double_vec", "dot", "with_norm", "cosine_topk", "sign_bucket"]


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a strict left fold (stable summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = as_double_vec(vec_col)
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(dot(F.col("_v"), F.col("_v"))))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Output: (query_id, neighbor_id, cos_sim double, rk int), self-pairs
    excluded, ties broken by neighbor id.
    """
    cand = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("cv"), F.col("_norm").alias("cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def sign_bucket(vec_col: Column | str, bits: int = 4) -> Column:
    """Coordinate-hyperplane sign bucket: '1'/'0' per leading dimension."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat(
        *[
            F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )
