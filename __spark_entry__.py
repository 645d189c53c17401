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

# The driver verifies the FIRST 50 registered queries.  After round 7
# the ledger is fully closed — every one of the 252 registered queries
# has a green driver CORRECTNESS row and the latest row is green for
# all of them (LEDGER.json) — so windows are now pure staleness
# rotation: changed code first, then oldest evidence.
_PRIORITY = [
    # ---- ROUND-9 WINDOW ----------------------------------------------
    # Registry 253 (the 252 freeze + one sanctioned slack slot for the
    # posting_freq_cap valve, VERDICT r8 "Next" #4/#6).  Window = 1 new
    # query + 5 changed-code canaries + the ENTIRE 40-query r2/r3
    # staleness backlog (VERDICT r8 "Next" #2 — it fits with 4 slots
    # spare).  After this run no registered query's evidence is older
    # than r4.
    #
    # Slot 1: NEW this round — the exact n-gram tier's posting_freq_cap
    # valve (df-filtered exact Jaccard; every retained posting bucket
    # ≤ cap ⇒ join output linear in the corpus).  Never driver-checked.
    "dedup_ngram_jaccard_capped",
    # Slots 2-3: changed code — jaccard_pairs/containment_pairs now
    # build their posting rows through the shared _posting_rows helper
    # (uncapped path emits the identical plan; canaried anyway per the
    # changed-implementation convention).
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    # Slots 4-6: changed code — subcluster_cells gained max_levels
    # validation and a multiset no-progress metric (hierarchical path
    # only; oracle SFs stay on the flat quantizer path — re-verified
    # via check_oracle at sf0.01 before staging).
    "dedup_semantic_semdedup",
    "similarity_mutual_knn_pairs",
    "pipeline_full_train_prep",
    # Slots 7-15: the 9 r2-latest rows (oldest evidence in the fleet).
    "similarity_ann_sign_lsh",
    "similarity_cosine_topk",
    "skew_salted_aggregation",
    "star_join_sales",
    "text_chunking",
    "text_fingerprints",
    "text_token_counts",
    "topk_parts_per_brand",
    "unpivot_measures",
    # Slots 16-46: all 31 r3-latest rows — the backlog drains to zero.
    "bigram_stats",
    "crossmodal_doc_embedding_join",
    "dedup_embedding_cosine",
    "dedup_simhash_hamming",
    "dedup_tf_cosine",
    "events_value_anomalies",
    "pipeline_pack_sequences",
    "q11_important_parts",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q20_excess_stock_suppliers",
    "q21_waiting_orders",
    "q22_inactive_rich_customers",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit_adapted",
    "sample_mixture_weighted",
    "sample_weighted_poisson",
    "similarity_ann_sq8",
    "text_cdc_chunks",
    "text_exact_substring_dedup",
    "text_pii_scrub",
    "text_repetition_ratios",
    "text_winnowing_fingerprints",
    "tfidf_distinctive_terms",
    "vocab_top_tokens",
    # Slots 47-50: the 4 spare slots go to minhash-family canaries —
    # their shared caches changed PHYSICALLY this round (xxhash-array /
    # signature persists now batch-bounded at 2000 rows; values
    # provably identical, canaried anyway per convention).
    "dedup_minhash_lsh",
    "dedup_clusters_minhash",
    "dedup_incremental_batch",
    "dedup_lsh_recall_sampled",
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
