"""Lloyd's k-means over embedding columns — the trained coarse
quantizer for IVF-style ANN (``similarity_ann_ivf`` uses a fixed-stride
stand-in so its oracle stays deterministic; this is the real thing).

Iterative Spark formulation:
  1. centroids ← first k vectors (deterministic seeding; k-means++ would
     need a seeded RNG — avoided so runs are replayable)
  2. assign: broadcast centroids, argmin squared-L2 per vector (one
     narrow pass, no shuffle)
  3. update: mean of assigned vectors per cluster = element-wise
     ``posexplode`` sums — ONE aggregation shuffle of (cluster, dim)
     partial sums, never vectors to the driver
  4. repeat until movement < tol or max_iter

Only the k×d centroid matrix ever reaches the driver (it must: it is
broadcast back).  Cost per iteration = one scan + one (k·d)-row shuffle
— the textbook scalable layout.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import as_double_vec

__all__ = ["kmeans_fit", "assign_clusters"]


def _centroid_struct(centroids: list[list[float]]):
    """Centroids as a literal array-of-arrays column."""
    return F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])


def assign_clusters(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Add ``cluster`` = argmin squared-L2 distance to ``centroids``."""
    v = as_double_vec(vec_col)
    cents = _centroid_struct(centroids)
    # dist_i = Σ (x_j - c_ij)²  computed as a fold per centroid
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cluster = F.array_position(dists, F.array_min(dists)) - 1
    return df.withColumn("cluster", cluster.cast("int"))


def kmeans_fit(
    df: DataFrame,
    *,
    k: int = 8,
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], float]:
    """Fit k-means; returns (centroids, inertia).

    Deterministic: seeds from the first k rows ordered by the frame's
    natural id ordering (callers should pass a deterministic frame).
    """
    first = df.limit(k).select(as_double_vec(vec_col).alias("v")).collect()
    centroids = [list(r["v"]) for r in first]
    dim = len(centroids[0])

    for _ in range(max_iter):
        assigned = assign_clusters(df, centroids, vec_col)
        # element-wise sums via posexplode: (cluster, dim_idx) partial sums
        exploded = assigned.select(
            "cluster", F.posexplode(as_double_vec(vec_col)).alias("i", "x")
        )
        sums = (
            exploded.groupBy("cluster", "i")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        counts = [0] * k
        acc = [[0.0] * dim for _ in range(k)]
        for r in sums:
            acc[r["cluster"]][r["i"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        for c in range(k):
            if counts[c]:
                new_centroids[c] = [s / counts[c] for s in acc[c]]
        movement = max(
            math.dist(a, b) for a, b in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if movement < tol:
            break

    final = assign_clusters(df, centroids, vec_col)
    cents = _centroid_struct(centroids)
    sq = F.aggregate(
        F.zip_with(
            as_double_vec(vec_col),
            F.element_at(cents, F.col("cluster") + 1),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    inertia = final.agg(F.sum(sq).alias("i")).first()["i"]
    return centroids, float(inertia)
