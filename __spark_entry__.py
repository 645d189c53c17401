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

# The driver verifies the FIRST 50 registered queries.  After round 5,
# 186 of the 207 then-registered queries carry green driver CORRECTNESS
# rows (latest row green for every one); the round-6 window below
# closes the remaining 21, re-canaries the two queries whose
# implementation changed after their latest rows, front-loads every
# round-6 addition, and spends the rest on oldest-row family canaries.
_PRIORITY = [
    # ---- ROUND-7 WINDOW ----------------------------------------------
    # The registry is FROZEN this round at 252 (251 + the one sanctioned
    # addition below): the window's whole job is ledger convergence
    # (VERDICT r6 "Next" #1/#2).  tools/driver_sim.py --ledger rebuilds
    # LEDGER.json from the recorded CORRECTNESS rounds; the pytest gate
    # asserts every never-driver-checked query sits inside this window.
    #
    # Slots 1-18: the 18 session-7 additions that have NEVER had a
    # driver CORRECTNESS row (all 18 were independently re-run green by
    # the r6 judge through the driver-faithful gate; this rotation puts
    # driver rows behind them).
    "crossmodal_coverage_report",
    "dedup_lsh_precision_report",
    "dedup_minhash_multiband_sweep",
    "dedup_removal_bias_audit",
    "dedup_token_savings_report",
    "events_hour_weekday_heatmap",
    "events_new_vs_returning_daily",
    "events_time_to_convert_quantiles",
    "events_type_mix_drift_weekly",
    "events_user_lifetime_stats",
    "events_wilson_ci_error_rate",
    "orders_daily_revenue_7d_ma",
    "orders_repeat_purchase_intervals",
    "orders_ship_latency_quantiles",
    "sample_soft_dedup_weights",
    "stats_runs_test_daily",
    "text_hash_collision_audit",
    "vocab_good_turing_unseen_mass",
    # Slot 19: the round-7 registry addition (VERDICT r6 "Next" #3 names
    # it explicitly: the hot-block-capped linkage variant over the
    # planted repeat-heavy fixture) — a NEW query needs a first row.
    "customers_linkage_clusters_capped",
    # Slots 20-21: changed-implementation canaries — both linkage base
    # queries were refactored onto operators/linkage.py this round
    # (hot_block_cap=None keeps the exact all-pairs semantics and plan,
    # but changed code needs fresh driver rows; latest rows r6).
    "customers_record_linkage_fs",
    "customers_linkage_clusters",
    # Slots 22-39: ALL 18 remaining r1-latest rows — four rounds stale,
    # the oldest evidence in the ledger (VERDICT r6 "Next" #1).
    "array_regex_functions",
    "cross_join_region_priority",
    "customers_without_orders",
    "date_functions",
    "events_json_extract",
    "events_latest_per_user",
    "full_outer_nation_presence",
    "map_functions",
    "orders_of_overdrawn_customers",
    "posexplode_tokens",
    "price_percentiles",
    "q10_returned_item_losses",
    "q12_shipmode_priority",
    "q16_supplier_counts",
    "q6_forecast_revenue",
    "range_band_join",
    "rollup_revenue",
    "segments_intersect_except",
    # Slots 40-42: changed-implementation canaries for the inline-IVF
    # trio — round 7's 30× decade sweep caught the fixed-61 centroid
    # cadence going quadratic (k ∝ N ⇒ N·k coarse assignment;
    # similarity_ann_ivf_sq8 measured segment α ~1.7), so all three now
    # derive cadence = max(61, ceil(√N)) on BOTH engines (bit-identical
    # at oracle SFs, tri-SF re-verified).  Changed code outranks stale
    # canaries (r6 precedent).
    "similarity_ann_ivf_sq8",
    "similarity_ann_ivf",
    "similarity_ann_ivf_nprobe2",
    # Slots 43-50: the oldest r2 rows VERDICT r6 names.  Three of its
    # 11 were displaced by the canaries above with family coverage
    # justifications: similarity_cosine_topk (the similarity family now
    # holds three changed-code slots in this window), text_chunking
    # (text family canaried by text_lang_id + string_functions), and
    # dedup_embedding_lsh (dedup family canaried by dedup_clusters here
    # plus the whole session-7 dedup-report block in slots 1-18).  They
    # rotate in next round with the remaining ~20 r2/r3 rows — with 252
    # registered and 50 slots the ledger can't fully converge in one
    # window; never-checked + changed code outrank them.
    "string_functions",
    "conditional_functions",
    "sql_over_path_scan",
    "distinct_projection_split",
    "empty_schema_select",
    "dedup_clusters",
    "text_lang_id",
    "sample_stratified_deterministic",
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
