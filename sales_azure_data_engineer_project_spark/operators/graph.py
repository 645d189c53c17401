"""Iterative graph operators — connected components for dedup clustering.

Near-dup detection yields PAIRS; acting on them (keep one doc per
duplicate group) needs the transitive closure: connected components.
This is the canonical *iterative* Spark algorithm (same loop shape as
GraphX's CC / large-scale label propagation):

    labels ← id
    repeat: label(v) ← min(label(v), min over neighbors' labels)
    until fixpoint

Each round is one shuffle (join + min-aggregate); rounds = graph
diameter (tiny for dup clusters, which are near-cliques).  Results are
persisted per round and the previous round unpersisted, so lineage
stays O(1) — without that, iteration k would replay all k-1 prior
joins (the classic iterative-Spark trap).

Driver involvement is one boolean per round (did any label change) —
the loop is data-size-independent.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with min(id) of its connected component.

    ``nodes``: one column ``id_col`` (isolated nodes allowed).
    ``edges``: undirected pairs (one direction suffices; symmetrized
    here).  Returns (id, component) with component = least member id.
    """
    # persist the edge list: it is re-joined EVERY round, and without
    # this the entire upstream lineage (for dedup clustering, the whole
    # shingle/Jaccard pipeline) would re-execute per iteration
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym.d == labels.id, "inner"
        ).select(F.col("s").alias("id"), "component")
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels
