"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sales_azure_data_engineer_project_spark import queries_analytics  # noqa: F401  (registers)
from sales_azure_data_engineer_project_spark import queries_core
from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401  (registers)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies the FIRST 50 registered queries.  After round 3,
# 119 of the 137 registered queries have driver CORRECTNESS rows
# (CORRECTNESS_r01 ∪ r02 ∪ r03); this round-4 order front-loads the 18
# queries the driver has NEVER checked (all late round-3 additions —
# each already passed the judge's independent re-run of the
# driver-faithful DuckDB gate, VERDICT.md r3), followed by 32 canaries
# chosen one-per-family from multiply-proven queries so regressions in
# already-green code still surface.  Two canaries are deliberately
# queries whose implementation CHANGES this round and therefore needs a
# fresh driver row: dim_dense_keys (two-phase surrogate keys replace
# the single-reducer global window) and approx_distinct_stats
# (graduating from rows-only to a bounded-error oracle).
_PRIORITY = [
    # --- 18 never-driver-checked (late round-3 additions) ---
    "approx_distinct_kmv",
    "dedup_graph_triangles",
    "dedup_lsh_recall",
    "events_cohort_retention",
    "events_distribution_drift",
    "events_transition_matrix",
    "fuzzy_name_pairs_symspell",
    "interval_overlap_sweep",
    "market_basket_pairs",
    "parts_pareto_frontier",
    "pipeline_split_train_val_test",
    "profile_lineitem_columns",
    "quality_functional_dependencies",
    "sample_domain_quota",
    "similarity_ann_lsh_multiprobe",
    "spatial_neighbor_pairs",
    "tokens_heavy_hitters_cms",
    "vocab_bpe_encode",
    # --- 32 canaries: one per proven family (all r1/r2/r3 green) ---
    "flagship_revenue_by_nation_year",  # star join + agg (also entry())
    "pricing_summary",                  # grouped sum family
    "customers_with_orders",            # semi/anti-join family
    "union_segments",                   # union family
    "max_order_key",                    # scalar-agg family
    "derived_columns",                  # derive/cast family
    "top_orders",                       # multi-key sort family
    "dim_dense_keys",                   # CHANGED r4: two-phase surrogate keys
    "window_rank_suite",                # window-function suite
    "q3_shipping_priority",             # TPC-H core
    "q5_supplier_volume_by_region",     # TPC-H 6-way join
    "q19_disjunctive_predicates",       # TPC-H disjunctive pushdown
    "grouping_sets_revenue",            # grouping sets/rollup family
    "pivot_returnflag_status",          # pivot family
    "json_functions",                   # json family
    "stats_aggregates_exact",           # stats-agg family
    "null_safe_equality",               # null-semantics family
    "events_sessionization",            # events window family
    "events_asof_last_purchase",        # as-of join family
    "events_funnel",                    # funnel family
    "text_quality_stats",               # text-quality family
    "text_span_dup_stats",              # span-dedup family
    "text_trigram_lm_score",            # LM-score family
    "dedup_exact",                      # exact-dedup family
    "dedup_minhash_lsh",                # MinHash-LSH family
    "dedup_semantic_semdedup",          # semantic-dedup family
    "similarity_ann_ivf_kmeans",        # IVF-ANN family
    "similarity_ann_pq",                # PQ-ANN family
    "multimodal_features",              # multimodal binary plumbing
    "pipeline_decontaminate",           # train-prep pipeline family
    "vocab_bpe_merges",                 # tokenizer family
    "approx_distinct_stats",            # CHANGED r4: bounded-error oracle
]


def _ordered(mapping: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in mapping]
    if missing:
        raise KeyError(f"priority list names unregistered queries: {missing}")
    rest = [n for n in mapping if n not in set(_PRIORITY)]
    return {n: mapping[n] for n in [*_PRIORITY, *rest]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by customer nation and order year over orders ⟕ customer ⟕
    nation — the reference's one analytics query
    (`2_Silver_Notebook.py:63`, groupBy(branch, year).sum.sort)
    generalized onto the corpus star schema.
    """
    return queries_core.QUERIES["flagship_revenue_by_nation_year"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(queries_core.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each (SQL-expressible) query."""
    qs = dict(queries_core.ORACLES)
    return {n: qs[n] for n in queries() if n in qs}
