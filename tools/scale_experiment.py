"""Empirical scaling check for the dedup/ANN headliners (round-3 task).

The sandbox ships sf0.1 as the largest corpus, so the 100 TB claims
(Σ bucket² posting joins, constant-size signatures, cell-restricted ANN
probes) rest on plan analysis.  This tool builds synthetic 3× and 10×
blow-ups of ``documents``/``embeddings`` and measures how the headline
operators' wall-clock actually grows, recording the fitted scaling
exponent α in t ≈ c·N^α (α ≈ 1 → linear, α ≈ 2 → the quadratic failure
mode the designs are supposed to avoid).

Blow-up construction keeps per-copy corpus STATISTICS stable instead of
planting 10 clones of every document (which would measure in-cluster
pair explosion, a different quantity):

- documents: copy i prefixes every token with ``c{i}·`` — each copy
  owns a disjoint shingle space, so shingle-bucket sizes stay constant
  while bucket COUNT grows with N (the web-corpus growth model: more
  text ≈ proportionally more distinct shingles).
- embeddings: copy i adds a small deterministic per-copy offset to
  every component — vectors stay in-distribution, no exact duplicates.

Usage:  python tools/scale_experiment.py [base_sf_dir]
Writes scaled corpora under /tmp/spark_scale_exp/ and prints a
markdown-ready table (paste into NOTES.md).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Override via SPARK_SCALE_FACTORS="1,10,30" (round-6: VERDICT r5 "Next"
# #6 extends the five slowest families one decade to 30×, and #8 uses the
# 10× blow-up of sf0.1 as the sf1-equivalent smoke for the headline set).
SCALES = [
    int(s)
    for s in os.environ.get("SPARK_SCALE_FACTORS", "1,3,10").split(",")
]
# (name, scales) — registered queries over documents/embeddings only
# (the scaled corpora don't rebuild the TPC-H tables)
QUERIES = [
    ("dedup_minhash_lsh", [1, 3, 10]),
    ("dedup_clusters_minhash", [1, 3, 10]),
    ("similarity_ann_ivf_sq8", [1, 3, 10]),
    ("text_exact_substring_dedup", [1, 3, 10]),
    ("text_trigram_lm_score", [1, 3, 10]),
    ("vocab_bpe_merges", [1, 3, 10]),
    ("text_lang_classifier_nb", [1, 3, 10]),
    # since round 5 the registered query derives k from corpus size
    # (k = max(8, ceil(N/64))) — the paper's linear regime; the fixed-k
    # row below documents the quadratic failure mode it replaced
    # (cluster sizes grow ∝ N at fixed cluster count), measured to 3×.
    ("dedup_semantic_semdedup", [1, 3, 10]),
    ("semdedup[k=8]", [1, 3]),
    # round-4 additions
    ("pipeline_full_train_prep", [1, 3, 10]),
    ("dedup_lsh_recall_sampled", [1, 3, 10]),
    ("text_gopher_quality_rules", [1, 3, 10]),
    ("similarity_matryoshka_agreement", [1, 3, 10]),
    ("embedding_cluster_quality", [1, 3, 10]),
    ("dedup_graph_pagerank", [1, 3, 10]),
    ("text_ngram_novelty", [1, 3, 10]),
    # round-5 additions (VERDICT r4 "Next" #6) — events-table queries;
    # the blow-up adds disjoint USERS (ids offset per copy, series
    # repeated), the natural growth model: per-user windows/sessions
    # stay constant-size while user count scales with N
    ("events_resample_gapfill", [1, 3, 10]),
    ("events_watermark_late_stats", [1, 3, 10]),
    ("events_value_histogram", [1, 3, 10]),
    ("events_robust_anomalies_mad", [1, 3, 10]),
    ("events_asof_next_purchase", [1, 3, 10]),
    ("events_scd2_user_history", [1, 3, 10]),
    ("pipeline_data_mixture_epochs", [1, 3, 10]),
    # round-5 query additions
    ("similarity_ann_ivf_pq", [1, 3, 10]),
    ("dedup_cluster_representatives", [1, 3, 10]),
    ("ann_recall_ivf", [1, 3, 10]),
    ("ann_recall_multiprobe", [1, 3, 10]),
    # round-5 session-2 additions
    ("dedup_shingle_containment", [1, 3, 10]),
    ("text_dsir_importance", [1, 3, 10]),
    ("text_quality_classifier_hashed", [1, 3, 10]),
    ("quality_adaptive_thresholds", [1, 3, 10]),
    ("ann_recall_pq", [1, 3, 10]),
    ("pipeline_filter_ablation", [1, 3, 10]),
    ("text_boilerplate_chunks", [1, 3, 10]),
    ("dedup_minhash_containment_estimate", [1, 3, 10]),
    ("embedding_pca_power_iteration", [1, 3, 10]),
    # round-5 session-3 additions
    ("text_ccnet_perplexity_buckets", [1, 3, 10]),
    ("quantile_sketch_bottomk", [1, 3, 10]),
    ("pipeline_global_shuffle", [1, 3, 10]),
    ("pipeline_curriculum_order", [1, 3, 10]),
    ("pipeline_unimax_language_budget", [1, 3, 10]),
    ("dedup_cross_source_matrix", [1, 3, 10]),
    ("quality_score_calibration", [1, 3, 10]),
    # round-5 session-4 additions.  Doc copies own disjoint vocab, so
    # BM25's per-term posting lists stay constant-size while term count
    # grows ∝ N (index build dominates, the web growth model) and the
    # bounded copy-0 query set keeps probe cost fixed.  Customer copies
    # repeat the QI distribution verbatim: class count constant, class
    # sizes ∝ N — one combinable groupBy either way.
    ("similarity_hard_negatives", [1, 3, 10]),
    ("quality_k_anonymity", [1, 3, 10]),
    ("sample_temperature_mixture", [1, 3, 10]),
    ("pipeline_sequence_packing", [1, 3, 10]),
    ("text_bm25_topk", [1, 3, 10]),
    ("text_tokenizer_fertility", [1, 3, 10]),
    ("quality_knn_label_noise", [1, 3, 10]),
    ("embedding_outliers_topk", [1, 3, 10]),
    ("stats_bootstrap_ci", [1, 3, 10]),
    ("quality_metadata_consistency", [1, 3, 10]),
    # round-5 session-5 additions.  RRF's tiers are both bounded-query
    # (copy-0 ids < 8), so only the BM25 index build grows; the Bloom
    # eval set is copy-0-only (doc_id < 100000) — bitmap constant,
    # train-span probe stream ∝ N; k-center is k map scans ∝ N; HLL is
    # one combinable register aggregate (orderkey distincts grow ∝ N,
    # partkey/suppkey repeat → registers saturate early either way).
    ("text_hybrid_rrf_topk", [1, 3, 10]),
    ("pipeline_bloom_decontam", [1, 3, 10]),
    ("sample_coreset_kcenter", [1, 3, 10]),
    ("approx_distinct_hll", [1, 3, 10]),
    # session-5 batch 2.  Event copies own disjoint users → per-type
    # distinct grows ∝ N while sketches stay k=64 (Partial
    # WindowGroupLimit caps map output pre-shuffle); lineitem copies
    # repeat the price distribution verbatim → the KS value grid stays
    # CONSTANT while per-value counts grow ∝ N (one combinable
    # groupBy), so the two-level cumsum's work is flat.
    ("approx_set_ops_kmv", [1, 3, 10]),
    ("stats_ks_two_sample", [1, 3, 10]),
    # session-5 batch 3.  Priority sampling: items per flag ∝ N but the
    # WGL-capped sample stays 128; HLL merge: disjoint users ∝ N, the
    # daily sketch build stays one combinable ≤256-rows-per-day agg.
    ("sample_priority_topk", [1, 3, 10]),
    ("approx_distinct_hll_merged", [1, 3, 10]),
    # session-5 batch 4: both are single combinable groupBys over
    # bounded output domains (category cells / event types).
    ("stats_chi2_independence", [1, 3, 10]),
    ("events_decayed_engagement", [1, 3, 10]),
    # session-5 batch 5: MW's value grid repeats under the user-copy
    # blow-up (counts ∝ N, grid constant); TVD's doc copies own
    # disjoint vocab → the token equi-join grows ∝ vocab ∝ N with
    # constant posting sizes.
    ("events_mannwhitney_auc", [1, 3, 10]),
    ("text_source_token_tvd", [1, 3, 10]),
    # session-5 batch 6: coverage-curve vocab grows ∝ N (disjoint
    # per-copy vocab) but collapses to the count-of-counts relation;
    # CUSUM's (type × day) relation is constant — only the daily
    # groupBy grows.
    ("vocab_coverage_curve", [1, 3, 10]),
    ("events_cusum_changepoint", [1, 3, 10]),
    # session-5 batch 7: burstiness rides the (doc, token) combine
    # (disjoint vocab per copy → postings constant, vocab ∝ N);
    # Benford needs the orders table, which the blow-up does not
    # rebuild — its scale shape (9-cell combinable agg) is the same
    # as chi2's measured-flat row, so it inherits that evidence.
    ("text_token_burstiness", [1, 3, 10]),
    # session-5 batch 8: kappa rides the lang-id per-doc aggregate
    # (docs ∝ N, 1-row confusion out); CUBE is one Expand+combine
    # over the constant category grid.
    ("quality_rater_agreement_kappa", [1, 3, 10]),
    ("cube_revenue_by_flag_status", [1, 3, 10]),
    # session-5 batch 9: within-cell directed scoring — Σ|cluster|²
    # with fixed k=8 grows ∝ N²/k at constant k (the oracle-replay
    # pin); the registered SemDeDup regime (k ∝ N) is the 100 TB path.
    ("similarity_mutual_knn_pairs", [1, 3, 10]),
    # session-5 batch 10: concentration needs orders+customer, which
    # the blow-up does not rebuild — its corpus-scale stage (one
    # combinable groupBy(custkey) + dimension join + bounded
    # per-segment cumsum) matches the measured-flat chi2/priority
    # shapes and inherits that evidence.
    # session-5 batch 11: bounded 16-vector query set × candidate
    # tokens — map-scale, both aggregates combinable.
    ("similarity_maxsim_late_interaction", [1, 3, 10]),
    # session-5 batch 13: sketch build is one combinable groupBy with
    # ≤ d·w counters out per column; exact side one groupBy(key).
    ("stats_join_size_estimate", [1, 3, 10]),
    # round-6 additions.  Checksum/manifest/simpson/oov/EMD ride the
    # documents blow-up (disjoint vocab per copy); skew_report rides
    # lineitem (key count ∝ N, count-of-counts grid bounded); hopping/
    # OLS/attribution ride events (disjoint users, window cells and
    # type grids bounded); FS linkage rides customer (disjoint keys,
    # blocking prefix cardinality ∝ N, block sizes constant); capped
    # LSH rides documents (planted hot bucket grows ∝ N but emission
    # is O(m) star edges).
    ("dedup_lsh_hot_bucket_capped", [1, 3, 10]),
    ("pipeline_shard_checksum", [1, 3, 10]),
    ("pipeline_incremental_manifest", [1, 3, 10]),
    ("quality_simpson_diversity", [1, 3, 10]),
    ("pipeline_skew_report", [1, 3, 10]),
    ("vocab_oov_rate_by_source", [1, 3, 10]),
    ("events_hopping_window_rate", [1, 3, 10]),
    ("events_value_trend_ols", [1, 3, 10]),
    ("customers_record_linkage_fs", [1, 3, 10]),
    ("text_source_length_emd", [1, 3, 10]),
    ("events_touch_attribution", [1, 3, 10]),
    ("dedup_graph_label_propagation", [1, 3, 10]),
    # session-7 additions.  Audience overlap: users ∝ N but the mask
    # inventory stays ≤2^|types|; spearman/theil-sen/autocorr all
    # collapse to the ≤|types|·|days| daily grid in one combinable
    # groupBy (copies repeat the calendar, so the grid is CONSTANT and
    # only the first aggregate grows); inter-arrival gaps: disjoint
    # users ∝ N, distinct-gap grid grows sub-linearly (ms collisions);
    # k-core peels the same banded candidate graph as pagerank.
    ("events_audience_overlap_jaccard", [1, 3, 10]),
    ("events_autocorr_daily", [1, 3, 10]),
    ("stats_spearman_daily", [1, 3, 10]),
    ("stats_theil_sen_trend", [1, 3, 10]),
    ("events_interarrival_quantiles", [1, 3, 10]),
    ("dedup_graph_kcore", [1, 3, 10]),
    # heaps: the ONE groupBy(token) vocab build grows ∝ N (disjoint
    # per-copy shingle spaces), the decile grid stays 10 rows; tukey:
    # per-source length grid is bounded by the length domain (copies
    # repeat it verbatim); trigrams: disjoint users ∝ N, constant
    # per-user window size, ≤|types|³ journey keys.
    ("vocab_heaps_growth", [1, 3, 10]),
    ("quality_tukey_fences_by_source", [1, 3, 10]),
    ("events_journey_trigrams", [1, 3, 10]),
    # weekday anomalies: same ≤|types|·|days| daily-grid collapse as
    # the trend/ACF family; balanced downsample: label partitions grow
    # ∝ N but the per-label rank is the standard top-k window shuffle;
    # DAU/WAU: user-day dedup ∝ N then a constant 7× map-side explode.
    ("events_weekday_deseasonalized_anomalies", [1, 3, 10]),
    ("sample_balanced_class_downsample", [1, 3, 10]),
    ("events_dau_wau_stickiness", [1, 3, 10]),
    # linkage clusters: match edges ∝ N (blocked), 3 fixed O(|E|)
    # rounds; split leakage: the proven banded-candidate shape plus a
    # map-side split tag; ship latency: fact⋈orders key join then the
    # bounded (priority × delay-domain) grid.
    ("customers_linkage_clusters", [1, 3, 10]),
    ("pipeline_split_leakage_check", [1, 3, 10]),
    # banding sweep: ONE signature build + bucket-moment aggregates,
    # zero pair materialization at any r (the 76s pair-join draft was
    # rewritten for exactly this); lifetimes: two combinable groupBys;
    # coverage: one key equi-join + groupBy(source).
    ("dedup_minhash_multiband_sweep", [1, 3, 10]),
    ("events_user_lifetime_stats", [1, 3, 10]),
    ("crossmodal_coverage_report", [1, 3, 10]),
    # removal-bias: banded flag set + length-grid cumsum (bounded);
    # collision audit: vocabulary-bounded distinct + ≤2^16 buckets.
    ("dedup_removal_bias_audit", [1, 3, 10]),
    ("text_hash_collision_audit", [1, 3, 10]),
    # Wilson / runs test: both collapse to the ≤|days| / ≤|types|·|days|
    # daily grid in one combinable groupBy; the statistics are
    # projections (IEEE-only float ops) over the bounded aggregate.
    ("events_wilson_ci_error_rate", [1, 3, 10]),
    ("stats_runs_test_daily", [1, 3, 10]),
    # Good-Turing: the tokenizer-build groupBy(token) + one global
    # aggregate; type-mix drift: the |weeks|·|types| grid.
    ("vocab_good_turing_unseen_mass", [1, 3, 10]),
    ("events_type_mix_drift_weekly", [1, 3, 10]),
    # token savings: the proven verified-pair + CC chain plus one
    # token-count projection and a single-row aggregate.
    ("dedup_token_savings_report", [1, 3, 10]),
    # round-7: the hot-block-capped linkage variant — under the
    # verbatim customer-copy blow-up EVERY block becomes an
    # identical-record clique growing ∝ factor, exactly the regime the
    # two-star cap bounds: emission is O(n_a+n_b) per hot block, so α
    # stays well under the base queries' audited in-answer 0.79.
    ("customers_linkage_clusters_capped", [1, 3, 10]),
    # conversion latency: two per-user MIN groupBys + the gap-grid
    # ECDF; new-vs-returning: user-day dedup + first-day MIN + one
    # key join — all natural-key shuffles.
    ("events_time_to_convert_quantiles", [1, 3, 10]),
    ("events_new_vs_returning_daily", [1, 3, 10]),
    # heatmap: one groupBy to ≤168 cells; MA7: daily aggregate + the
    # constant ×7 sequence-explode of the collapsed daily relation.
    ("events_hour_weekday_heatmap", [1, 3, 10]),
    ("orders_daily_revenue_7d_ma", [1, 3, 10]),
    # soft dedup: verified-pair + CC chain + cluster-size rollup.
    ("sample_soft_dedup_weights", [1, 3, 10]),
    # precision report: banded candidates + pair-only verification.
    ("dedup_lsh_precision_report", [1, 3, 10]),
]
WORK = "/tmp/spark_scale_exp"


def build_scaled(spark, base_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(base_dir, "events.parquet"))
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
    cu = spark.read.parquet(os.path.join(base_dir, "customer.parquet"))
    orders = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
    # dimensions stay fixed-size under real scale growth (nation is 25
    # rows at every TPC-H SF): pass them through verbatim so star joins
    # (flagship) run against the scaled fact
    for dim in ("nation", "region"):
        spark.read.parquet(os.path.join(base_dir, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{dim}.parquet"))

    # Fan-out via broadcast crossJoin with a copy-index table, NOT a
    # factor-way union (round 10): the old per-copy unionByName loop
    # built a `factor`-branch plan per table — at 3000× that is 18,000
    # union branches across six tables, and the driver spent 20+ min
    # single-threaded inside Catalyst analysis before a single task ran
    # (observed: one core at 93%, zero executor activity).  A
    # crossJoin(broadcast(copies)) keeps the plan O(1) in `factor`,
    # executes the blow-up in parallel across the repartitioned base,
    # and produces the same rows: every per-copy expression below takes
    # the copy index from the `copy` COLUMN instead of a closure int.
    # Content is deterministic either way (fixed per-copy salts/offsets);
    # only row order/file layout differ, which no consumer depends on.
    copies = F.broadcast(
        spark.range(factor).select(F.col("id").alias("copy"))
    )

    def fanout(df, width: int):
        # factor-scaled width (SCALING.md round-10 "Output-file sizing"):
        # a FIXED 32/64-way fan-out at 3000× writes ~500-750 MB part
        # files whose row groups OOM the vectorized reader under 32-task
        # concurrency; scaling the width with the factor keeps part
        # files near base-partition size at every tier.
        return df.repartition(min(1200, max(width, factor))).crossJoin(copies)

    cp = F.col("copy")

    prefix = F.concat(F.lit("c"), cp.cast("string"), F.lit("·"))
    toks = F.split(F.col("text"), r"\s+")
    salted = F.concat_ws(" ", F.transform(toks, lambda t: F.concat(prefix, t)))
    d = fanout(docs, 32).select(
        (F.col("doc_id") + cp * 1_000_000).alias("doc_id"),
        F.when(cp == 0, F.col("text")).otherwise(salted).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )

    off = (cp.cast("double") * 1e-3)
    vec = F.transform(F.col("embedding"), lambda x: (x + off).cast("float"))
    e = fanout(emb, 32).select(
        (F.col("vec_id") + cp * 1_000_000).alias("vec_id"),
        F.when(cp == 0, F.col("embedding")).otherwise(vec).alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )

    # disjoint user (and event-id) space per copy: per-user series
    # repeat verbatim, so sessionization/as-of/SCD-2 state per key
    # stays constant while the key count grows ∝ N
    v = fanout(ev, 32).select(
        (F.col("event_id") + cp * 100_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + cp * 100_000_000).alias("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "ts", "user_id")],
    )

    # disjoint order-key space per copy, value distribution repeated
    # verbatim: per-group (returnflag) row counts grow ∝ N while the
    # quantile targets stay put — the natural growth model for the
    # bottom-k sketch (sample size is fixed at k regardless of N)
    t = fanout(li, 64).select(
        (F.col("l_orderkey") + cp * 1_000_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )

    # disjoint customer keys, QI tuple distribution repeated: the
    # k-anonymity class COUNT stays constant while class sizes grow
    u = fanout(cu, 32).select(
        (F.col("c_custkey") + cp * 10_000_000).alias("c_custkey"),
        *[c for c in cu.columns if c != "c_custkey"],
    )

    # custkey offsets track cu_copy so the orders→customer FK stays
    # intact per copy: the flagship star join's fan-out per customer
    # is constant while customer count grows ∝ N
    o = fanout(orders, 32).select(
        (F.col("o_orderkey") + cp * 1_000_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + cp * 10_000_000).alias("o_custkey"),
        *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
    )
    d.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    e.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    v.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    t.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    u.write.mode("overwrite").parquet(os.path.join(out_dir, "customer.parquet"))
    o.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # optional: restrict to the named queries (re-measure only new rows).
    # Named queries run at every SPARK_SCALE_FACTORS scale, whether or
    # not they appear in QUERIES (e.g. flagship for the sf1 smoke).
    only = list(dict.fromkeys(sys.argv[2:]))
    if only:
        queries = [(n, list(SCALES)) for n in only]
    else:
        queries = list(QUERIES)
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.caching import release_caches
    from sales_azure_data_engineer_project_spark.session import get_spark

    # GCLocker spurious-OOM guard (JDK 17, G1): parquet/snappy and lz4
    # hold JNI critical regions; under 32-thread allocation storms the
    # default GCLockerRetryAllocationCount=2 gives up after two retries
    # and throws OutOfMemoryError for 4-WORD allocations while the heap
    # has gigabytes free ("Retried waiting for GCLocker too often" in
    # the gc,alloc log, immediately before every 'OOM').  Measured at
    # the 3000× minhash tier: the signature aggregate 'OOMs' spuriously
    # with both hex and binary signatures.  Raising the retry count is
    # the documented JDK workaround (the GCLocker was removed in JDK 21
    # for exactly this failure mode); it only affects the retry loop,
    # never results.  Local mode: driver JVM == executor JVM, so the
    # driver option covers both.
    spark = get_spark(
        "scale-exp",
        extra_conf={
            "spark.driver.extraJavaOptions": (
                "-XX:+UnlockDiagnosticVMOptions "
                "-XX:GCLockerRetryAllocationCount=64"
            ),
        },
    )
    # ADVICE r10: extraJavaOptions only applies if THIS call launched the
    # JVM — getOrCreate silently ignores extra_conf when a session already
    # exists (harness imported after another get_spark, spark-submit).
    # Verify the guard actually landed; warn loudly if not, because the
    # 1000×/3000× tiers spuriously OOM without it.
    _jvm_args = list(
        spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
        .getInputArguments()
    )
    if not any("GCLockerRetryAllocationCount=64" in a for a in _jvm_args):
        print(
            "WARNING: scale harness JVM is MISSING "
            "-XX:GCLockerRetryAllocationCount=64 (a SparkSession existed "
            "before this harness started; extra_conf was ignored). "
            "Tiers >=1000x may spuriously OOM — restart without a prior "
            "session.",
            flush=True,
        )
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Ambient-load probe (same synthetic plan + 0.30 s clean reference as
    # bench.py): the sandbox shares hardware, and a scale exponent fitted
    # across a load spike is noise — readers divide by load_factor first.
    from pyspark.sql import functions as _F

    _pa = spark.range(100_000).select(
        _F.col("id"),
        (_F.col("id") % 97).alias("k"),
        _F.md5(_F.col("id").cast("string").cast("binary")).alias("h"),
    )
    _pb = spark.range(97).select(_F.col("id").alias("k"), _F.lit("d").alias("v"))

    def _probe() -> float:
        t0 = time.perf_counter()
        (
            _pa.join(_F.broadcast(_pb), "k")
            .groupBy("k")
            .agg(_F.count(_F.lit(1)).alias("n"), _F.min("h").alias("mh"))
            .orderBy(_F.col("n").desc(), "k")
            .write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    _probe()  # compile the probe plan untimed
    probes = [_probe()]

    # SPARK_SCALE_REUSE=1 skips rebuilding a blow-up dir whose largest
    # table already has a _SUCCESS marker — the builds are deterministic
    # (fixed per-copy salts), so reuse is safe and saves ~10 min per
    # iteration when re-probing single queries at the 300×/1000× tiers.
    reuse = os.environ.get("SPARK_SCALE_REUSE") == "1"
    dirs = {}
    for s in SCALES:
        out = base if s == 1 else os.path.join(WORK, f"x{s}")
        if s > 1:
            # every table build_scaled writes must carry its marker:
            # lineitem alone is written mid-sequence, so an interrupted
            # build could be reused with customer/orders missing or
            # stale from an older build (ADVICE r9)
            done = all(
                os.path.exists(os.path.join(out, f"{t}.parquet", "_SUCCESS"))
                for t in (
                    "nation", "region", "documents", "embeddings",
                    "events", "lineitem", "customer", "orders",
                )
            )
            if reuse and done:
                print(f"reusing {s}x corpus at {out}", flush=True)
            else:
                print(f"building {s}x corpus at {out} ...", flush=True)
                build_scaled(spark, base, s, out)
        dirs[s] = out

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        semdedup_drops,
    )

    qs = entry_mod.queries()

    def runner(name):
        if name == "semdedup[k=8]":
            return lambda sp, d, s: semdedup_drops(sp, d, k=8)
        fn = qs[name]
        return lambda sp, d, s: fn(sp, d)

    # Per-tier shuffle sizing (SCALING.md round-10 addenda): AQE
    # COALESCES small partitions but never SPLITS a materialized
    # sort/window shuffle, so the cores-derived default (32) that is
    # right for every tier ≤ 30× puts ~50M posting rows through each
    # sort-spill at 3000× (GCLocker retry storms).  Above 30× the
    # initial number scales with the corpus; bench/oracle SFs keep the
    # session default (a blanket 512 was A/B'd 1.26× WORSE at sf0.1).
    # This was applied by hand in the round-10 probe sessions; wired
    # into the harness so the recorded recipe is the committed one.
    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    base_split = spark.conf.get("spark.sql.files.maxPartitionBytes")

    def _tier_shuffle(s: int) -> None:
        if s > 30:
            # multiplier base = the session's cores-derived default, not a
            # literal 32 — on hosts with other core counts the >30× tiers
            # must scale from the same base the ≤30× tiers restore
            # (ADVICE r10)
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(1024, int(base_shuffle) * (s // 30))),
            )
        else:
            spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
        # Input-split sizing, the MAP-side sibling of the shuffle rule
        # (guide §5 "more partitions → smaller per-task state"): shuffle
        # partitions only bound post-exchange state, but a corpus-sized
        # groupBy's PARTIAL aggregate holds one hash/sort buffer per
        # input split — at 3000× the 2.6 GB documents table splits into
        # ~21 tasks of ~700k docs each, and the minhash signature
        # aggregate (8 binary mins/doc) OOM'd the 8 GB heap map-side
        # (round-10 session 2: the binary-signature fix halved the
        # cache, moving the OOM from CachedRDDBuilder into the partial
        # agg).  32 MB splits at the 1000×+ tiers quarter the per-task
        # group count; every tier ≤ 300× keeps the 128 MB default that
        # sf0.1 and production scans want (§6.1).
        if s >= 1000:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", base_split)

    results: dict[str, dict[int, float]] = {}
    for name, scales in queries:
        fn = runner(name)
        results[name] = {}
        for s in scales:
            _tier_shuffle(s)
            # guide §1.5: label the tier's jobs for UI-enabled debugging
            spark.sparkContext.setJobDescription(f"scale: {name} @ {s}x")
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, dirs[s], s).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                release_caches()
                spark.catalog.clearCache()
                # localCheckpoint blocks (iterative graph/quantizer
                # rounds) are NOT table cache and NOT tracked persists:
                # they free only when the driver GCs the DataFrame
                # references and the ContextCleaner processes them.  At
                # the 300× tier that lag accumulated four queries'
                # worth of checkpoint blocks in one JVM and OOM'd
                # dedup_clusters even though every query passes alone
                # (round-9 session log) — an explicit GC nudge between
                # UNTIMED runs drains the cleaner queue deterministically.
                import gc as _gc

                _gc.collect()
                spark.sparkContext._jvm.System.gc()
            results[name][s] = best
            print(f"  {name} @ {s}x: {best:.2f}s", flush=True)
            spark.sparkContext.setJobDescription(None)
        _tier_shuffle(1)  # probes always run at the session default
        probes.append(_probe())

    probe_median = sorted(probes)[len(probes) // 2]
    print(
        f"\nload probe: median {probe_median:.3f}s, max {max(probes):.3f}s, "
        f"load_factor {probe_median / 0.30:.2f}"
    )
    hdr = " | ".join(f"{s}x" for s in SCALES)
    print(f"\n| query | {hdr} | exponent (1x->max) |")
    print("|---" * (len(SCALES) + 2) + "|")
    for name, r in results.items():
        top, bot = max(r), min(r)
        # fit from the smallest measured scale (single-scale runs,
        # e.g. SPARK_SCALE_FACTORS=300 re-checks, print no exponent)
        alpha = (
            f"{math.log(r[top] / r[bot]) / math.log(top / bot):.2f}"
            if top > bot
            else "—"
        )
        cells = " | ".join(f"{r[s]:.2f}s" if s in r else "—" for s in SCALES)
        print(f"| {name} | {cells} | {alpha} |")
    if not reuse:
        # under SPARK_SCALE_REUSE=1 the corpora stay for the next probe
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
