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

# The driver verifies the FIRST 50 registered queries.  Rounds 1+2
# together drove 70 of the 110 registered queries green
# (CORRECTNESS_r01 ∪ CORRECTNESS_r02); this round-3 order front-loads
# the 40 queries NEVER driver-checked (all round-2 additions: adapted
# TPC-H Q2/Q4/Q7/Q8/Q9/Q11/Q13/Q14/Q15/Q17/Q18/Q20/Q21/Q22, the
# window-rank/json/stats/null-safe suites, the SimHash-Hamming /
# TF-cosine / SQ8 / IVF×SQ8 / PQ / kmeans ANN tiers, CDC chunks,
# span-dup, repetition ratios, PII scrub, weighted sampling, vocab,
# funnel, crossmodal) followed by 10 cross-round canaries — one per
# proven family — so regressions in already-green code still surface.
_PRIORITY = [
    # --- 40 never-driver-checked (registration order of r2) ---
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit_adapted",
    "q11_important_parts",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q20_excess_stock_suppliers",
    "q21_waiting_orders",
    "q22_inactive_rich_customers",
    "window_rank_suite",
    "json_functions",
    "stats_aggregates_exact",
    "null_safe_equality",
    "events_value_anomalies",
    "dedup_simhash_hamming",
    "dedup_embedding_cosine",
    "dedup_tf_cosine",
    "dedup_clusters_minhash",
    "similarity_ann_sq8",
    "similarity_ann_ivf_sq8",
    "similarity_ann_ivf_nprobe2",
    "similarity_ann_ivf_kmeans",
    "similarity_ann_pq",
    "approx_distinct_stats",
    "sample_weighted_poisson",
    "vocab_top_tokens",
    "tfidf_distinctive_terms",
    "bigram_stats",
    "text_winnowing_fingerprints",
    "text_repetition_ratios",
    "text_cdc_chunks",
    "text_span_dup_stats",
    "text_pii_scrub",
    "crossmodal_doc_embedding_join",
    "pipeline_training_prep",
    "pipeline_decontaminate",   # new in r3 — benchmark-contamination check
    "pipeline_pack_sequences",  # new in r3 — fixed-length sequence packing
    "sample_mixture_weighted",  # new in r3 — per-source mixture rates
    "dedup_incremental_batch",  # new in r3 — batch-vs-corpus near-dup
    "dedup_semantic_semdedup",  # new in r3 — SemDeDup cluster-scoped cosine
    "text_trigram_lm_score",    # new in r3 — integer-exact LM familiarity
    "vocab_bpe_merges",         # new in r3 — BPE tokenizer-merge induction
    "text_lang_classifier_nb",  # new in r3 — trained NB language classifier
    "text_exact_substring_dedup",  # new in r3 — keep-first span removal
    # --- canaries: driver-green in r1/r2, one per family ---
    # (grouped_map_normalize, dedup_exact and text_quality_stats
    # rotated out for the three new round-3 queries above — each was
    # green in BOTH prior rounds, and their families keep coverage via
    # multimodal_features / dedup_minhash_lsh / the text suite)
    # (flagship_revenue_by_nation_year rotated out for
    #  text_exact_substring_dedup — entry() still smoke-runs the
    #  flagship every round, and it was oracle-green in r1 AND r2)
    # (pricing_summary rotated out for vocab_bpe_merges — the grouped-
    #  aggregate family keeps many in-window TPC-H representatives)
    # (events_sessionization rotated out for text_trigram_lm_score —
    #  the events family keeps events_value_anomalies in-window)
    # (dedup_minhash_lsh rotated out for text_lang_classifier_nb — the
    #  dedup family keeps simhash-hamming / clusters-minhash /
    #  incremental / semdedup in-window)
    # (similarity_ann_ivf rotated out for dedup_semantic_semdedup —
    #  the IVF family keeps 4 in-window representatives: SQ8, IVF×SQ8,
    #  nprobe2, kmeans)
    "multimodal_features",              # multimodal binary plumbing
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
