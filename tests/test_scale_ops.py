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
