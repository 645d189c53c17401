"""Blocked bipartite candidate generation for record linkage, with a
hot-block safety valve.

Blocking is the standard linkage scale move: candidates are generated
only inside blocks that agree on a cheap key (here one equi-join), so
candidate count tracks Σ_block (n_a · n_b) instead of |A|·|B|.  The
residual hazard is the HOT BLOCK — production corpora repeat verbatim
names (franchise branches, placeholder records, ingest replays), and a
block with f records per side emits f² candidates into one join task.
This is the bipartite sibling of the LSH hot-bucket valve
(``operators.dedup.lsh_candidate_pairs(hot_bucket_cap=...)``, VERDICT r6
"Next" #3): blocks whose candidate count ``n_a · n_b`` exceeds the cap
switch from all-pairs to TWO-STAR emission — the A-side hub (min id)
pairs with every B record, and every other A record pairs with the
B-side hub — which is O(n_a + n_b) edges and no single-task blowup.

Exactness contract (same as the LSH cap): the two-star topology spans
the block, so downstream connected components are preserved EXACTLY
when the hot block is a clique under the match predicate — identical
repeated records, which is precisely how hot blocks arise.  When a hot
block mixes entities, pairs between two non-hub members are never
scored (bounded-recall approximation); the exact all-pairs behavior is
the ``hot_block_cap=None`` default used by the oracle-checked base
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import tracked_persist


def blocked_bipartite_pairs(
    a: DataFrame,
    b: DataFrame,
    block_cols: list[str],
    a_id: str,
    b_id: str,
    *,
    hot_block_cap: int | None = None,
) -> DataFrame:
    """Per-block candidate pairs a × b.

    Both inputs must expose ``block_cols`` under identical names; all
    other column names must be disjoint (callers prefix the B side).
    Output columns: block_cols + A's other columns + B's other columns,
    one row per candidate pair.

    ``hot_block_cap=None`` → exact all-pairs within each block (ONE
    equi-join).  With a cap, per-block side counts and hubs come from
    two map-side-combinable groupBys joined back on the block key —
    never a window over raw rows — and blocks with
    ``n_a · n_b > hot_block_cap`` emit the two-star edge set instead.
    """
    if hot_block_cap is None:
        return a.join(b, on=block_cols)
    sa = a.groupBy(*block_cols).agg(
        F.count(F.lit(1)).alias("_na"), F.min(a_id).alias("_hub_a")
    )
    sb = b.groupBy(*block_cols).agg(
        F.count(F.lit(1)).alias("_nb"), F.min(b_id).alias("_hub_b")
    )
    # inner join: blocks present on only one side emit no pairs anyway.
    # Persisted: all three emission branches (cold, hub-A star, hub-B
    # star) read it, and it is one bounded row per block — the same
    # small-relation persist contract as the dedup signature frames
    stats = sa.join(sb, on=block_cols).transform(tracked_persist)
    hot = F.col("_na") * F.col("_nb") > hot_block_cap
    cold_keys = stats.filter(~hot).select(*block_cols)
    hot_stats = stats.filter(hot).select(*block_cols, "_hub_a", "_hub_b")
    cold_pairs = a.join(cold_keys, on=block_cols).join(b, on=block_cols)
    a_tag = a.join(hot_stats, on=block_cols)
    # hub_a × every B record in the block
    star1 = (
        a_tag.filter(F.col(a_id) == F.col("_hub_a"))
        .drop("_hub_a", "_hub_b")
        .join(b, on=block_cols)
    )
    # every non-hub A record × hub_b (disjoint from star1 by a_id)
    hub_b_rows = b.join(
        hot_stats.select(*block_cols, "_hub_b"), on=block_cols
    ).filter(F.col(b_id) == F.col("_hub_b")).drop("_hub_b")
    star2 = (
        a_tag.filter(F.col(a_id) != F.col("_hub_a"))
        .drop("_hub_a", "_hub_b")
        .join(hub_b_rows, on=block_cols)
    )
    return cold_pairs.unionByName(star1).unionByName(star2)
