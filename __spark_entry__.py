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
    # ---- ROUND-8 WINDOW ----------------------------------------------
    # Registry still frozen at 252.  Window = round-8 changed code
    # first, then ALL remaining r2-latest rows, then the oldest r3
    # rows to fill 50 (VERDICT r7 "Next" #4 pre-plan).  After this run
    # no registered query's evidence is older than r3; the 20 r3 rows
    # that no longer fit are the documented round-9 backlog (listed at
    # the end of this comment block's slot-29 section).
    #
    # Slots 1-5: changed-implementation canaries from the session-1
    # work.  The inline-IVF trio now derives its √N centroid cadence
    # INSIDE the plan (broadcast 1-row count aggregate — ADVICE r7;
    # results bit-identical, plan changed).  The two linkage-cluster
    # queries sit on the round-8 constant shave: two-branch hot-block
    # emission in operators/linkage.py and the self-looped
    # single-reference label-propagation rounds in
    # _entity_size_histogram (VERDICT r7 "Next" #3; capped 11.5s ->
    # ~5.5s at sf0.1, histogram identical).
    "similarity_ann_ivf_sq8",
    "similarity_ann_ivf",
    "similarity_ann_ivf_nprobe2",
    "customers_linkage_clusters_capped",
    "customers_linkage_clusters",
    # Slots 6-13: session-2 broadcast-audit canaries.  A fleet sweep of
    # all 184 F.broadcast call sites found five relations that grow ∝
    # corpus being broadcast (per-doc shingle sizes in jaccard_pairs /
    # containment_pairs, the full-vocab BM25 idf table, the BPE word
    # encoder map, the NB per-(class,token) weights).  Fixes: sizes
    # carried through posting rows (joins eliminated), BM25 query-term
    # semi-join pushed below the index aggregates (idf now |query
    # terms|-bounded), the other two demoted to plain equi-joins (AQE
    # re-broadcasts them while small).  Values bit-identical — all
    # re-verified via tools/check_oracle.py at sf0.01 before this
    # staging.  (text_trigram_lm_score's count table was briefly
    # demoted too, then reverted: it is charset³-bounded, not ∝
    # corpus.)
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_lsh_recall_sampled",
    "dedup_shingle_containment",
    "text_bm25_topk",
    "text_hybrid_rrf_topk",
    "vocab_bpe_encode",
    "text_lang_classifier_nb",
    # Slots 14-15: the 100× decade tier (new this round) OOM'd the
    # columnar cache of the char-ARRAY representation both these
    # queries persisted (~56 bytes/char in 10k-row cache batches);
    # they now persist the compact lowered TEXT and re-derive the
    # char array streamed per consumer.  Values bit-identical —
    # re-verified via check_oracle at sf0.01; 100× now completes
    # (34s / 36s, α ≈ 0.55).
    "text_trigram_lm_score",
    "text_ccnet_perplexity_buckets",
    # Slots 16-18: session-3 hierarchical-quantizer canaries.  The
    # 100× decade tier measured the corpus-scaled (k ∝ N) SemDeDup
    # quantizer's flat N·k Lloyd assignment going quadratic (N²/64:
    # 102 s, α 0.83 — the fleet's worst 100× row); above
    # _HIER_QUANTIZER_K the fit is now two-level (coarse √k JVM Lloyd
    # + per-cell local refinement, ~N^1.5).  The gate keeps every
    # oracle SF on the UNCHANGED flat path (k ≤ 32 there), so results
    # and plans at sf0.01 are identical — canaried anyway, per the
    # round-7 IVF-cadence precedent for changed implementations.
    # Post-fix 100×: semdedup 28.6 s (α 0.49), funnel 45.0 s,
    # mutual-knn 35.9 s (α 0.58, first decade row).
    "dedup_semantic_semdedup",
    "pipeline_full_train_prep",
    "similarity_mutual_knn_pairs",
    # Slots 19-37: session-3 long-shingle canaries.  The 300× tier
    # OOM'd the string-array shingle cache (~25-byte strings × ~100/doc
    # inflating in columnar batches — the trigram fix's class);
    # operators/dedup._shingled now persists xxhash64 LONGS (all its
    # consumers need identity only: posting joins, sizes,
    # array_intersect verification) and the md5 signature build streams
    # raw strings off its own text scan (minhash_signatures).  Values
    # bit-identical — all 24 affected queries re-verified via
    # check_oracle at sf0.01 before this staging; the 5 already
    # staged above keep their slots.  Post-fix 300×: minhash_lsh
    # 39.6 s (OOM before — and faster than its old 100× 59.7 s),
    # clusters_minhash 75.1 s, ngram_jaccard 220.7 s, all sub-linear.
    "dedup_minhash_lsh",
    "dedup_clusters_minhash",
    "dedup_incremental_batch",
    "pipeline_training_prep",
    "dedup_cluster_representatives",
    "dedup_cross_source_matrix",
    "dedup_graph_kcore",
    "dedup_graph_label_propagation",
    "dedup_graph_pagerank",
    "dedup_graph_triangles",
    "dedup_lsh_hot_bucket_capped",
    "dedup_lsh_precision_report",
    "dedup_minhash_containment_estimate",
    "dedup_minhash_estimate_calibration",
    "dedup_minhash_multiband_sweep",
    "dedup_removal_bias_audit",
    "dedup_token_savings_report",
    "pipeline_split_leakage_check",
    "sample_soft_dedup_weights",
    # Slots 38-50: the 13 alphabetically-first r2-latest rows.  The
    # session-3 canary block above displaced the rest of the pre-planned
    # staleness rotation — changed code outranks evidence age by the
    # window convention.  Round-9 backlog (r2: similarity_ann_sign_lsh,
    # similarity_cosine_topk, skew_salted_aggregation, star_join_sales,
    # text_chunking, text_fingerprints, text_token_counts,
    # topk_parts_per_brand, unpivot_measures; r3: bigram_stats,
    # crossmodal_doc_embedding_join, dedup_embedding_cosine,
    # dedup_simhash_hamming, dedup_tf_cosine, events_value_anomalies,
    # pipeline_pack_sequences, q11_important_parts,
    # q13_customer_order_distribution, q14_promo_revenue,
    # q15_top_supplier, q17_small_quantity_revenue,
    # q18_large_volume_customers, q20_excess_stock_suppliers,
    # q21_waiting_orders, q22_inactive_rich_customers,
    # q2_min_cost_supplier, q4_order_priority_check,
    # q7_nation_trade_volume, q8_market_share,
    # q9_product_profit_adapted, sample_mixture_weighted,
    # sample_weighted_poisson, similarity_ann_sq8, text_cdc_chunks,
    # text_exact_substring_dedup, text_pii_scrub,
    # text_repetition_ratios, text_winnowing_fingerprints,
    # tfidf_distinctive_terms, vocab_top_tokens).
    "ann_recall_at_k",
    "dedup_embedding_lsh",
    "dedup_simhash",
    "events_hourly_rollup",
    "events_rolling_1h_value",
    "grouped_map_normalize",
    "having_filter",
    "orders_above_avg_price",
    "orders_per_customer_array",
    "pandas_udaf_weighted",
    "price_delta_vs_prev_order",
    "richest_customer_per_nation",
    "running_total_by_supplier",
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
