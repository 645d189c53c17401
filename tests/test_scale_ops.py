"""Scale-oriented operator tests: as-of join, skew salting, bucketed
co-located joins (with physical-plan assertions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_azure_data_engineer_project_spark.io import write_bucketed_table
from sales_azure_data_engineer_project_spark.operators.asof import asof_join
from sales_azure_data_engineer_project_spark.operators.skew import salted_join, salted_sum


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 205, "t2"), (2, 50, "t3"), (3, 10, "t4")],
        ["sym", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [(1, 90, 9.0), (1, 100, 10.0), (1, 200, 20.0), (2, 60, 6.0)],
        ["sym", "ts", "px"],
    )
    out = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="ts", payload=["px"]
        ).collect()
    }
    assert out["t1"] == 10.0  # equal-ts quote matches (<= semantics)
    assert out["t2"] == 20.0  # latest prior
    assert out["t3"] is None  # quote is later than trade
    assert out["t4"] is None  # key with no quotes at all

    strict = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="ts",
            payload=["px"], strict=True,
        ).collect()
    }
    assert strict["t1"] == 9.0  # equal-ts quote excluded under strict <


def test_salted_sum_equals_plain(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"),  # 3 hot keys
        F.col("id").alias("uid"),
        (F.col("id") % 7).cast("long").alias("v"),
    )
    plain = {r["k"]: r["v_sum"] for r in df.groupBy("k").agg(F.sum("v").alias("v_sum")).collect()}
    salted = {
        r["k"]: r["v_sum"]
        for r in salted_sum(df, ["k"], {"v": "v_sum"}, salt_from="uid").collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = spark.range(0, 5_000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("uid")
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(4)], ["k", "attr"])
    plain = sorted(
        (r["uid"], r["attr"]) for r in big.join(small, "k", "left").collect()
    )
    salted = sorted(
        (r["uid"], r["attr"])
        for r in salted_join(big, small, "k", salt_from="uid").collect()
    )
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin without any
    shuffle Exchange in the physical plan."""
    a = spark.range(0, 1_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed_table(a, "bt_a", ["k"], buckets=8)
    write_bucketed_table(b, "bt_b", ["k"], buckets=8)
    # tiny test tables would broadcast (and skip the bucketed layout);
    # force the shuffle-join path a 100 TB fact join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 1_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_connected_components(spark):
    from sales_azure_data_engineer_project_spark.operators.graph import (
        connected_components,
    )

    # components: {1,2,3,4} (chain), {5,6}, {7} isolated
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["id"])
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["src", "dst"]
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_scd2_dimension_lifecycle(spark):
    from sales_azure_data_engineer_project_spark.operators.dimensions import (
        DimensionSpec,
    )
    from sales_azure_data_engineer_project_spark.operators.scd2 import (
        build_scd2_dimension,
    )

    spec = DimensionSpec("d", "key", "nk", ("attr",))
    b1 = spark.createDataFrame([("a", "A1"), ("b", "B1")], ["nk", "attr"])
    d1 = build_scd2_dimension(b1, None, spec, batch_ts="2024-01-01")
    rows1 = {(r["nk"], r["attr"]): r for r in d1.collect()}
    assert len(rows1) == 2 and all(r["is_current"] for r in rows1.values())

    # batch 2: a changes (close+open), b unchanged, c new
    b2 = spark.createDataFrame([("a", "A2"), ("b", "B1"), ("c", "C1")], ["nk", "attr"])
    d2 = build_scd2_dimension(b2, d1, spec, batch_ts="2024-02-01")
    rows = d2.collect()
    by = {(r["nk"], r["attr"]): r for r in rows}
    assert len(rows) == 4  # a:2 versions, b:1, c:1

    closed_a = by[("a", "A1")]
    assert not closed_a["is_current"] and closed_a["valid_to"] == "2024-02-01"
    open_a = by[("a", "A2")]
    assert open_a["is_current"] and open_a["valid_from"] == "2024-02-01"
    assert open_a["key"] != closed_a["key"]  # new version = new surrogate
    assert by[("b", "B1")]["is_current"] and by[("b", "B1")]["valid_from"] == "2024-01-01"
    assert by[("c", "C1")]["is_current"]

    # keys unique & dense across all versions
    keys = sorted(r["key"] for r in rows)
    assert keys == list(range(1, 5))

    # batch 3: a vanishes from source → stays current (no delete)
    b3 = spark.createDataFrame([("b", "B1")], ["nk", "attr"])
    d3 = build_scd2_dimension(b3, d2, spec, batch_ts="2024-03-01")
    cur = {r["nk"]: r["attr"] for r in d3.filter("is_current").collect()}
    assert cur == {"a": "A2", "b": "B1", "c": "C1"}


def test_merge_schema_evolution(spark):
    from sales_azure_data_engineer_project_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame([(1, "a")], ["k", "v"])
    source = spark.createDataFrame([(2, "b", 9.5)], ["k", "v", "score"])
    out = merge_upsert(target, source, ["k"], evolve_schema=True)
    rows = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    # without evolution the extra source column is projected away
    # (Delta's default: schema drift needs the explicit opt-in)
    flat = merge_upsert(target, source, ["k"])
    assert flat.columns == ["k", "v"]


def test_quality_expectations(spark):
    from sales_azure_data_engineer_project_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, "BR1", 2), (2, None, 9), (3, "BR3", 1), (3, "BR3", 2)],
        ["k", "branch", "units"],
    )
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    report = Q.check(
        df,
        [
            Q.not_null("branch"),
            Q.in_range("units", 1, 3),
            Q.matches("branch", "^BR"),
            Q.unique("k"),
            Q.references(dim, "k"),
        ],
    )
    assert report["not_null(branch)"] == 1
    assert report["in_range(units,[1,3])"] == 1
    assert report["matches(branch,^BR)"] == 0
    assert report["unique(k)"] == 1
    assert report["references(k)"] == 2  # the two k=3 rows are orphans

    with _raises_quality():
        Q.check(df, [Q.not_null("branch")], fail=True)


class _raises_quality:
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        from sales_azure_data_engineer_project_spark.operators.quality import (
            QualityError,
        )

        assert exc_type is QualityError, "expected QualityError"
        return True


def test_kmeans_separates_obvious_clusters(spark):
    from sales_azure_data_engineer_project_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )

    # two tight blobs around (0,0,..) and (10,10,..)
    rows = []
    for i in range(20):
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append((i, [base + (i % 5) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").orderBy(
        "vec_id"
    )
    centroids, inertia = kmeans_fit(df, k=2, max_iter=10)
    assigned = assign_clusters(df, centroids).collect()
    by_parity = {}
    for r in assigned:
        by_parity.setdefault(r["vec_id"] % 2, set()).add(r["cluster"])
    # each blob maps to exactly one cluster, and they differ
    assert len(by_parity[0]) == 1 and len(by_parity[1]) == 1
    assert by_parity[0] != by_parity[1]
    assert inertia < 0.1


def test_scale_headroom_5m_rows(spark):
    """Synthesize 5M fact rows in-memory and run the flagship plan shape
    (broadcast dim join → two-phase agg).  No timing assert — the point
    is that the partitioning/broadcast strategy survives a 10× scale-up
    of the bench SF without config changes."""
    fact = spark.range(0, 5_000_000).select(
        (F.col("id") % 1000).alias("custkey"),
        (F.col("id") % 7).cast("double").alias("qty"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), (F.col("id") % 25).alias("nationkey")
    )
    out = (
        fact.join(F.broadcast(dim), "custkey")
        .groupBy("nationkey")
        .agg(F.sum("qty").alias("total"), F.count(F.lit(1)).alias("n"))
    )
    rows = out.collect()
    assert len(rows) == 25
    assert sum(r["n"] for r in rows) == 5_000_000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_plan_quality_regressions(spark):
    """Golden plan properties for the headline shapes (PLANS.md enforced):
    dimension joins broadcast; aggregations have exactly one hash
    Exchange (plus at most a range Exchange for presentation ORDER BY)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    flagship = m.queries()["flagship_revenue_by_nation_year"](spark, sf)
    plan = flagship._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1

    pricing = m.queries()["pricing_summary"](spark, sf)
    pplan = pricing._jdf.queryExecution().executedPlan().toString()
    assert pplan.count("Exchange hashpartitioning") == 1
    # column pruning reached the scan: lineitem has 11 columns, the
    # query needs 5
    scan_line = next(l for l in pplan.splitlines() if "ReadSchema" in l)
    assert "l_quantity" in scan_line
    for pruned in ("l_orderkey", "l_partkey", "l_shipdate", "l_tax"):
        assert pruned not in scan_line, f"{pruned} not pruned from scan"

    # predicate PUSHDOWN reaches the parquet scan (row-group/page
    # skipping at scale): TPC-H Q6's selective conjunction must appear
    # in PushedFilters, and the scan must read only the 4 needed
    # columns of lineitem's 11
    q6 = m.queries()["q6_forecast_revenue"](spark, sf)
    q6scan = next(
        l
        for l in q6._jdf.queryExecution().executedPlan().toString().splitlines()
        if "PushedFilters" in l
    )
    for pf in ("IsNotNull(l_shipdate)", "IsNotNull(l_discount)", "IsNotNull(l_quantity)"):
        assert pf in q6scan, f"{pf} not pushed to scan"
    assert "GreaterThanOrEqual(l_shipda" in q6scan  # range pushdown (truncated repr)
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp>" in q6scan
    )


def test_stream_static_dim_enrichment(spark, tmp_path):
    """Stream ⋈ static dimension (broadcast) — the streaming fact
    enrichment every gold pipeline does before windowed aggs."""
    src = str(tmp_path / "enr_src")
    spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.0), (3, 30, 7.0)], "event_id long, code long, value double"
    ).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame([(10, "ten"), (20, "twenty")], ["code", "name"])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.join(F.broadcast(dim), "code", "left")
        .writeStream.format("memory")
        .queryName("enr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["event_id"]: r["name"] for r in spark.sql("SELECT * FROM enr_out").collect()}
    assert got == {1: "ten", 2: "twenty", 3: None}


def _unpartitioned_window_lines(plan: str) -> list[str]:
    """Mechanically extract Window nodes with NO partition spec from a
    physical-plan string (the ``WindowExec: No Partition Defined``
    hazard — a single-task global sort at scale).

    Format facts (verified empirically on Spark 4.1): a Window node
    prints ``Window [funcs], [partSpec], [orderSpec]`` when both specs
    exist, but drops empty groups, so bracket-counting cannot separate
    "partitioned, no order" from "ordered, no partition".  The reliable
    signal is inside ``windowspecdefinition(...)``: its args are
    partition columns (bare), then order columns (carrying ``ASC`` /
    ``DESC``), then the ``specifiedwindowframe(...)``.  A window is
    unpartitioned iff no bare arg precedes the frame."""
    import re

    out = []
    for line in plan.splitlines():
        s = re.sub(r"^[\s:+\-*()]*", "", line)
        if not s.startswith("Window "):
            continue
        i = 0
        flagged = False
        while not flagged:
            j = s.find("windowspecdefinition(", i)
            if j < 0:
                break
            k = j + len("windowspecdefinition(")
            depth, args, cur = 1, [], ""
            while depth and k < len(s):
                ch = s[k]
                if ch == "(":
                    depth += 1
                    cur += ch
                elif ch == ")":
                    depth -= 1
                    if depth:
                        cur += ch
                elif ch == "," and depth == 1:
                    args.append(cur.strip())
                    cur = ""
                else:
                    cur += ch
                k += 1
            if cur.strip():
                args.append(cur.strip())
            pre = [a for a in args if not a.startswith("specifiedwindowframe(")]
            if not [a for a in pre if " ASC" not in a and " DESC" not in a]:
                out.append(s[:160])
                flagged = True
            i = k
    return out


def test_unpartitioned_window_detector():
    """The detector itself: catches a per-row global running sum and a
    global row_number, does NOT flag partitioned windows (with or
    without an order spec)."""
    good_part_order = (
        "Window [sum(x#1L) windowspecdefinition(g#2L, x#1L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS c#3L], [g#2L], [x#1L ASC NULLS FIRST]"
    )
    good_part_only = (
        "Window [min(cost#1) windowspecdefinition(p_partkey#2L, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS m#3], [p_partkey#2L]"
    )
    bad_global_sum = (
        "Window [sum(id#0L) windowspecdefinition(id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS c#2L], [id#0L ASC NULLS FIRST]"
    )
    bad_global_agg = (
        "Window [sum(n#0L) windowspecdefinition(specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), unboundedfollowing$())) AS t#2L]"
    )
    plan = "\n".join(
        f"   +- {l}" for l in (good_part_order, good_part_only, bad_global_sum, bad_global_agg)
    )
    hits = _unpartitioned_window_lines(plan)
    assert len(hits) == 2
    assert any("sum(id#0L)" in h for h in hits)
    assert any("sum(n#0L)" in h for h in hits)


def test_no_cartesian_or_python_udf_in_any_registered_plan(spark):
    """Fleet-wide plan hygiene over EVERY registered query: no
    CartesianProduct anywhere, row-at-a-time Python UDFs (BatchEvalPython)
    banned from all plans (Arrow tiers — ArrowEvalPython / mapInPandas /
    FlatMapGroupsInPandas — are the only allowed Python boundaries),
    BroadcastNestedLoopJoin only where a non-equi join is the point and
    the build side is constant-sized (allowlisted), and — VERDICT r5
    "Next" #3 — Window nodes with NO partition spec (single-task global
    sort at scale) only above relations whose size is bounded by an
    aggregate, never per-row (allowlisted with the bounding relation)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    # non-equi joins against constant-size build sides: a BNLJ over a
    # broadcast of O(1) rows is the intended plan, not a smell
    bnlj_ok = {
        "range_band_join",          # 3-band interval table
        "orders_above_avg_price",   # scalar subquery comparison
        "q22_inactive_rich_customers",  # scalar avg comparison
        "q11_important_parts",      # scalar total-value comparison
        "events_value_anomalies",   # scalar stddev bounds
        "dedup_embedding_cosine",   # blk equi-join + id< inequality picks BNLJ at tiny SF
        "events_funnel",            # per-user ts inequality after key join
        "q21_waiting_orders",       # correlated <> EXISTS rewrite
        "similarity_ann_ivf",       # broadcast centroid grid (crossJoin by design)
        "similarity_ann_ivf_nprobe2",
        "similarity_ann_ivf_sq8",   # same centroid grid + bounded-query probe
        "similarity_ann_ivf_kmeans",  # sq8 1-row min/max stats broadcast (crossJoin by design)
        "similarity_ann_ivf_pq",    # same shared _sq8_kmeans_cells 1-row stats broadcast;
                                    # the ADC probe itself is a cell equi-join
        "dedup_semantic_semdedup",  # same 1-row sq8 stats broadcast (shared _sq8_kmeans_cells)
        "tokens_heavy_hitters_cms",  # 4-row seed grid broadcast (crossJoin by design)
        "events_distribution_drift",  # 1-row midpoint/boundaries/totals broadcasts
        "dedup_graph_triangles",  # 1-row wedge/triangle aggregates crossJoined
        "ann_recall_at_k",
        "ann_recall_multiprobe",  # same shape: 20-row broadcast query set × corpus, != join
        "ann_recall_ivf",  # same 20-row broadcast != join + shared _sq8_kmeans_cells stats broadcast
        "text_chunking",            # chunk-grid expansion
        "cross_join_region_priority",  # deliberate tiny-dim cross join
        "similarity_cosine_topk",   # brute-force baseline: bounded
                                    # query set broadcast × corpus (the
                                    # ANN tiers are the scale path)
        "similarity_ann_sq8",       # same bounded-query broadcast shape,
                                    # scored in the 8-bit code domain
        "similarity_ann_pq",        # ADC probe: bounded query LUT
                                    # broadcast against the code scan
        "pipeline_full_train_prep",  # shared _sq8_kmeans_cells 1-row
                                     # sq8 stats broadcast (as semdedup)
        "dedup_lsh_recall_sampled",  # 1-row count aggregates crossJoined
                                     # into one row
        "pipeline_data_mixture_epochs",  # 1-row Σ√tokens total broadcast
        "similarity_matryoshka_agreement",  # bounded-query broadcast ×
                                    # corpus, same as similarity_cosine_topk
        "embedding_cluster_quality",  # shared _sq8_kmeans_cells 1-row
                                      # sq8 stats broadcast
        "events_resample_gapfill",  # 1-row min/max span broadcast into
                                    # the generated time spine
        "text_dsir_importance",  # 1-row corpus/target total broadcast
                                 # onto the 256-bucket weight table
        "ann_recall_pq",  # 10-row truth query set broadcast != join
                          # + the PQ ADC LUT broadcast (as similarity_ann_pq)
        "pipeline_curriculum_order",  # 1-row quartile-cutoffs aggregate
                                      # (3 integers) broadcast onto docs
        "similarity_hard_negatives",  # bounded 10-query broadcast ×
                                      # corpus with the label-mismatch
                                      # predicate in the join condition
                                      # (same shape as similarity_cosine_topk)
        "sample_temperature_mixture",  # 1-row Σweight/Σtokens total
                                       # broadcast onto |sources| rows
        "quality_knn_label_noise",  # bounded 50-probe broadcast ×
                                    # corpus != join (calibration-gate
                                    # contract, as the ann_recall family)
        "embedding_outliers_topk",  # shared _sq8_kmeans_cells 1-row
                                    # sq8 stats broadcast (as
                                    # embedding_cluster_quality)
        "text_bm25_topk",  # 1-row corpus stats (N, avgdl) broadcast
                           # onto the query-term-bounded idf table and
                           # the posting join; retrieval joins are all
                           # term equi-joins
        "text_hybrid_rrf_topk",  # both tiers' proven shapes: the BM25
                                 # 1-row stats broadcast + the bounded
                                 # 8-query cosine broadcast != join;
                                 # fusion itself is an equi-join
        "pipeline_bloom_decontam",  # 1-row report aggregates (train
                                    # count, candidate counts, bitmap
                                    # popcount) crossJoined into one row
        "sample_coreset_kcenter",  # 1-row center picks broadcast into
                                   # each min-update round + the shared
                                   # sq8 1-row stats broadcast
        "approx_set_ops_kmv",  # bounded 5×5 event-type grid builds the
                               # pair relation; all sketch/exact joins
                               # are equi-joins
        "stats_ks_two_sample",  # bounded 3-row flag grid × value grid
                                # + 1-row corpus total broadcast; the
                                # cumsum itself is the two-level
                                # partitioned scan (no global window)
        "approx_distinct_hll_merged",  # 1-row estimate/exact aggregates
                                       # crossJoined into the report row
        "stats_chi2_independence",  # 1-row grand-total broadcast onto
                                    # the bounded category-cell relation
        "events_decayed_engagement",  # 1-row max-date broadcast into
                                      # the map-only decay projection
        "events_mannwhitney_auc",  # 1-row corpus-total broadcast onto
                                   # the bounded per-type rank sums
        "text_source_token_tvd",  # 1-row token-total broadcast onto
                                  # the source-margin relation
        "vocab_coverage_curve",  # 4-row target grid range-joined into
                                 # the bounded count-of-counts relation
                                 # (both BNLJ sides constant-size)
        "orders_benford_deviation",  # 1-row total broadcast onto the
                                     # 9-digit cell relation
        "text_token_burstiness",  # 1-row doc-count broadcast onto the
                                  # 50-row top-k relation
        "similarity_mutual_knn_pairs",  # shared _sq8_kmeans_cells 1-row
                                        # sq8 stats broadcast (as
                                        # dedup_semantic_semdedup)
        "similarity_maxsim_late_interaction",  # bounded 16-row query
                                               # token set broadcast ×
                                               # candidate tokens (the
                                               # ann-recall contract)
        "customers_rfm_segments",  # 1-row max-date broadcast into the
                                   # per-customer rollup
        "pipeline_token_budget_apportion",  # 1-row total + 1-row
                                            # shortfall broadcast onto
                                            # the |sources| relation
        "pipeline_skew_report",  # 1-row totals broadcast onto the
                                 # count-of-counts grid
        "text_source_length_emd",  # 1-row min/max broadcast for
                                   # bucketing + 32-row bucket-grid
                                   # broadcast onto |sources|
        "events_audience_overlap_jaccard",  # ≤2^|types| mask inventory
                                            # (groupBy output) × |types|²
                                            # pair grid — both bounded
        "events_interarrival_quantiles",  # 1-row gap-total broadcast
                                          # onto the distinct-gap ECDF
                                          # (as stats_ks_two_sample)
        "vocab_heaps_growth",  # 1-row max-doc-id broadcast onto the
                               # first-occurrence and doc relations
        "sample_balanced_class_downsample",  # 1-row global min-class-
                                             # size broadcast onto the
                                             # ranked rows
        "dedup_removal_bias_audit",  # 1-row total + 1-row quartile-
                                     # cutoff broadcasts onto the
                                     # length grid / corpus rows
        "events_type_mix_drift_weekly",  # 1-row grand-total broadcast
                                         # onto the |weeks|·|types| grid
        "events_time_to_convert_quantiles",  # 1-row converter-total
                                             # broadcast onto the gap
                                             # ECDF (as interarrival)
    }
    # Unpartitioned windows: every entry must name the BOUNDED relation
    # the global window runs over (always an aggregate output, never the
    # raw corpus) — the 100 TB justification for a single-task sort.
    global_window_ok = {
        "events_mannwhitney_auc",  # prefixsum.bucketed_cumsum level 2:
                                   # cumsum over |buckets| bucket TOTALS
                                   # (an aggregate), not over rows
        "customers_rfm_segments",  # 3× the same bucketed_cumsum level-2
                                   # shape (R/F/M quintile cutpoints)
        "vocab_coverage_curve",  # cumsum over the count-of-counts
                                 # relation (bounded by distinct token
                                 # frequencies, ≪ vocab ≪ corpus)
        "pipeline_token_budget_apportion",  # row_number over the
                                            # |sources| relation (5 rows;
                                            # largest-remainder ranking)
        "pipeline_global_shuffle",  # offset cumsum over the 16-shard
                                    # inventory (groupBy(shard) output)
        "pipeline_curriculum_order",  # cumsum over the per-difficulty
                                      # count grid (groupBy output,
                                      # bounded by |distinct scores|)
        "pipeline_unimax_language_budget",  # water-fill rank over the
                                            # per-language inventory
                                            # (groupBy(lang) output)
        "pipeline_skew_report",  # cumsum over the count-of-counts
                                 # grid (bounded by |distinct key
                                 # frequencies| — groupBy output)
        "events_audience_overlap_jaccard",  # dense_rank over the
                                            # DISTINCT event-type
                                            # relation (≤|types| rows)
        "events_interarrival_quantiles",  # bucketed_cumsum level 2:
                                          # cumsum over ≤ span/10⁷ ms
                                          # bucket TOTALS (aggregate)
        "vocab_heaps_growth",  # cumsum over the 10-row decile grid
                               # (groupBy output)
        "dedup_removal_bias_audit",  # bucketed_cumsum level 2: cumsum
                                     # over length-domain bucket
                                     # TOTALS (aggregate)
        "events_time_to_convert_quantiles",  # bucketed_cumsum level 2:
                                             # cumsum over ≤ span/day
                                             # bucket TOTALS (aggregate)
    }
    offenders = {}
    for name, fn in m.queries().items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("row-at-a-time PythonUDF")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append("unexpected BNLJ")
        gw = _unpartitioned_window_lines(plan)
        if gw and name not in global_window_ok:
            bad.append(f"unpartitioned window: {gw[0][:80]}")
        if bad:
            offenders[name] = bad
    assert not offenders, f"plan hygiene violations: {offenders}"


def test_lsh_hot_band_bucket_star_capping(spark):
    """Skewed-band stress (VERDICT r4 "Next" #8): 10% of a 20k-doc
    corpus is byte-identical boilerplate, so every band funnels those
    2,000 docs into ONE bucket — the web-corpus hazard where all-pairs
    emission is C(2000,2) rows materializing in a single join task.
    With ``hot_bucket_cap`` the bucket switches to star emission: the
    candidate graph keeps the same node coverage (hence the same
    connected components — a hot bucket is a clique, a star spans it)
    at O(m) edges, and the run stays inside tight time bounds."""
    import time

    from pyspark.sql import functions as F

    from sales_azure_data_engineer_project_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    n_docs, n_hot = 20_000, 2_000
    boiler = "lorem ipsum dolor sit amet the quick brown fox jumps over it"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit(boiler))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}u"), (F.col("id") * (j + 7)).cast("string"))
                    for j in range(12)
                ],
            )
        )
        .alias("text"),
    )
    bands = minhash_bands(docs, "doc_id", "text", n_hashes=8, band_size=4).persist()
    bands.count()

    t0 = time.perf_counter()
    capped = lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=256)
    rows = capped.collect()
    capped_sec = time.perf_counter() - t0
    # star emission: edge count is O(hot bucket), nowhere near C(m,2)
    assert len(rows) < 3 * n_hot, f"capped path emitted {len(rows)} pairs"
    hot_edges = [r for r in rows if r["id_a"] == 0]
    assert len(hot_edges) == n_hot - 1  # hub 0 → every other clique member
    # node coverage (⇒ connected components for the clique) matches the
    # exact path's: every hot doc appears in some pair either way
    covered = {r["id_a"] for r in rows} | {r["id_b"] for r in rows}
    assert set(range(n_hot)) <= covered
    # the capped plan must finish fast — generous bound that still
    # catches an accidental fall-through to the quadratic path
    assert capped_sec < 60, f"capped candidate generation took {capped_sec:.1f}s"

    # exact path on the same corpus stays the oracle-checked default:
    # spot-check agreement outside the hot bucket (all-pairs there)
    exact_cold = (
        lsh_candidate_pairs(bands, "doc_id")
        .filter(F.col("id_a") >= n_hot)
        .collect()
    )
    capped_cold = sorted(
        (r["id_a"], r["id_b"]) for r in rows if r["id_a"] >= n_hot
    )
    assert sorted((r["id_a"], r["id_b"]) for r in exact_cold) == capped_cold
    bands.unpersist()


def test_runtime_bloom_filter_prunes_selective_join(spark, tmp_path):
    """Runtime row-level filtering — the 100 TB selective-join lever:
    when a dim-side filter makes the join selective, Spark injects a
    bloom filter built from the dim keys into the FACT scan, so
    non-matching fact rows die at the scan instead of riding the
    shuffle.  Thresholds are forced down here (local parquet is tiny);
    at scale the defaults trigger on real sizes.  Asserts the filter is
    injected AND the result is identical with it disabled."""
    from pyspark.sql import functions as F

    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(fact_p)
    spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    ).write.parquet(dim_p)

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("grp") == 3)
        j = fact.join(dim, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        with_bloom = sorted((r["k"], r["v"]) for r in j.collect())
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        j2 = fact.join(dim, "k")
        assert "might_contain" not in j2._jdf.queryExecution().optimizedPlan().toString()
        assert sorted((r["k"], r["v"]) for r in j2.collect()) == with_bloom
        assert len(with_bloom) == 5_000 // 7 + (1 if 3 < 5_000 % 7 else 0)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bottomk_sketch_plan_has_partial_window_group_limit(spark):
    """The bottom-k quantile sketch's scale claim is that the rank<=k
    filter compiles to a PARTIAL WindowGroupLimit below the exchange —
    each map partition forwards at most k rows per group, so the
    shuffle carries O(groups·k·partitions), never the data.  Pin that
    plan shape so a regression (e.g. a filter spelling Spark can't
    push) is caught here, not at 100 TB."""
    import __spark_entry__ as m

    df = m.queries()["quantile_sketch_bottomk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit" in l and "Partial" in l]
    assert partial, plan
    # the Partial limit must sit BELOW its exchange (higher line index =
    # deeper in the printed tree = executed earlier)
    exch = [i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l]
    assert any(p > min(exch) for p in partial), plan


def test_iterative_graph_queries_reuse_persisted_edges(spark):
    """Runtime-shape pin for the iterative graph queries (VERDICT r5
    "Next" #5): the unrolled PageRank / triangle iterations must read
    the pre-joined edge list from cache, not replay the LSH chain per
    iteration.  PLAN_AUDIT's 240/72 parquet scans are the lineage
    PRINTED INSIDE the cached relations' definitions; this test pins
    (a) the iterations actually reference InMemoryTableScan nodes and
    (b) executing the query materializes the caches (cached partitions
    > 0) — a silent `tracked_persist` removal zeroes both.

    Round-10 (optimization): the kcore/LPA/PageRank LOOPS now truncate
    lineage with per-round ``localCheckpoint(eager=False)`` (the lazy-
    persist unroll nested the plan 3^rounds for kcore — measured sf0.1
    8.6→2.7 s with identical output), so the final executed plan reads
    the prior round as a ``Scan ExistingRDD`` instead of nesting every
    earlier round; the STATIC frames (signatures, edge lists, degree
    tables) stay persisted and referenced.  Expectations below pin both
    shapes: IMTS refs for the static caches, RDD scans for the
    truncated loop state."""
    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.caching import release_caches

    sf = "/root/testdata/sf0.001"
    expected = {
        # (min InMemoryTableScan refs, min "Scan ExistingRDD" refs,
        #  min materialized cached RDDs):
        # pagerank: the returned frame reads the LAST iteration's
        # checkpointed score vector (deg/edd cache refs live inside the
        # checkpointed lineage); persists shingled+signatures (minhash),
        # ed, deg, edd — all four materialize on collect
        "dedup_graph_pagerank": (0, 1, 4),
        # triangles persists the signature cache and the oriented edge
        # list, referenced by the wedge and closing joins (static
        # unroll, no loop state — unchanged by the round-10 swap).
        # min_cached=2: the old floor of 3 was only ever met by blocks
        # lingering from the PREVIOUS query's non-blocking release —
        # the exact vacuousness ADVICE r10 flagged (verified: a fresh
        # session materializes exactly these 2 persists)
        "dedup_graph_triangles": (3, 0, 2),
        # kcore: the final plan reads rounds 2-3's checkpointed edge
        # lists (active's degree + the final degree); the symmetric
        # edge cache + signature cache materialize during round 1
        "dedup_graph_kcore": (0, 2, 2),
        # LPA: the returned frame reads round 2's checkpointed label
        # frame; the edge + signature caches materialize on collect
        "dedup_graph_label_propagation": (0, 1, 2),
        # linkage clusters (round-11 swap, same contract as kcore/LPA):
        # the returned histogram reads round 3's checkpointed label
        # frame; the raw match-edge + self-looped edge caches
        # materialize during the collect
        "customers_linkage_clusters": (0, 1, 2),
        # the capped variant truncates the same way — its fat 3-way
        # candidate-union lineage now renders once (inside the edge
        # cache), not once per round
        "customers_linkage_clusters_capped": (0, 1, 2),
    }
    for name, (min_refs, min_rdd, min_cached) in expected.items():
        df = m.queries()[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        refs = plan.count("InMemoryTableScan")
        assert refs >= min_refs, f"{name}: only {refs} InMemoryTableScan refs"
        rdd_refs = plan.count("Scan ExistingRDD")
        assert rdd_refs >= min_rdd, f"{name}: only {rdd_refs} RDD-scan refs"
        df.collect()
        # ADVICE r10: getRDDStorageInfo also lists localCheckpoint blocks
        # (each graph query materializes ≥2 per run), which made the
        # min_cached floor vacuous — removing the static tracked_persists
        # no longer failed.  Checkpoint blocks report the bare RDD class
        # name ('MapPartitionsRDD'); real SQL cache buffers report the
        # cached plan string.  Count only the latter.
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        cached = sum(
            1
            for r in infos
            if r.numCachedPartitions() > 0
            and r.name() is not None
            and "MapPartitionsRDD" not in r.name()
        )
        assert cached >= min_cached, f"{name}: only {cached} real persists"
        release_caches()


def test_ledger_never_checked_queries_are_scheduled(spark):
    """Ledger gate (VERDICT r6 "Next" #5): every registered query either
    carries a driver CORRECTNESS row whose LATEST entry is green, or is
    scheduled inside the driver's next 50-slot verification window
    (the first 50 entries of queries()).  A query that is neither has
    silently fallen out of the verification rotation."""
    import __spark_entry__ as m
    from tools.driver_sim import DRIVER_WINDOW, build_ledger

    names = list(m.queries())
    led = build_ledger(names)
    window = set(names[:DRIVER_WINDOW])
    assert led["all_latest_rows_green"], "a latest driver row is red"
    unscheduled = [n for n in led["never_checked"] if n not in window]
    assert not unscheduled, (
        f"never-driver-checked queries outside the next window: {unscheduled}"
    )


def test_corpus_sized_relations_are_not_broadcast(spark):
    """Round-8 broadcast-audit pins: relations that grow ∝ corpus must
    never sit on the build side of an explicit broadcast (a driver OOM
    at web scale no matter how well it benches at test SF).

    - jaccard_pairs / containment_pairs carry per-doc shingle sizes
      through the posting rows, so their whole logical plan has exactly
      ONE join (the shingle posting self-join) — the two per-doc size
      joins (formerly ∝N broadcasts) are gone, not merely demoted.
    - BM25 pushes the bounded query-term set BELOW the index
      aggregates as a LeftSemi join, so tf/df/idf are |query terms|-
      bounded before anything is broadcast.
    """
    import __spark_entry__ as m

    from sales_azure_data_engineer_project_spark.operators import dedup as D

    QUERIES = m.queries()

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta") for i in range(8)],
        ["doc_id", "text"],
    )
    jac_plan = (
        D.jaccard_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert jac_plan.count("Join") == 1, jac_plan
    cont_plan = (
        D.containment_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert cont_plan.count("Join") == 1, cont_plan

    bm_plan = (
        QUERIES["text_bm25_topk"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftSemi" in bm_plan, bm_plan
