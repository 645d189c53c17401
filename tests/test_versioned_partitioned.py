"""Versioned-table commit protocol + partition-pruned layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_azure_data_engineer_project_spark.io import write_parquet
from sales_azure_data_engineer_project_spark.operators.versioned import VersionedTable


def test_versioned_merge_and_time_travel(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    assert vt.read() is None and vt.current_version() == 0

    v1 = vt.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    assert v1 == 1
    v2 = vt.merge(spark.createDataFrame([(2, "b2"), (3, "c")], ["k", "v"]), ["k"])
    assert v2 == 2

    now = {r["k"]: r["v"] for r in vt.read().collect()}
    assert now == {1: "a", 2: "b2", 3: "c"}
    # time travel: v1 still intact after the merge commit
    old = {r["k"]: r["v"] for r in vt.read(version=1).collect()}
    assert old == {1: "a", 2: "b"}


def test_versioned_vacuum(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(4):
        vt.overwrite(spark.createDataFrame([(i,)], ["x"]))
    dropped = vt.vacuum(keep_last=2)
    assert dropped == [1, 2]
    assert vt.read(version=4).first()["x"] == 3
    assert vt.read(version=1) is None


def test_partitioned_write_prunes_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(y, i, float(i)) for y in (2017, 2018, 2019) for i in range(50)],
        ["Year", "id", "v"],
    )
    p = str(tmp_path / "part")
    write_parquet(df, p, partition_by=["Year"])
    scan = spark.read.parquet(p).filter(F.col("Year") == 2018)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(Year" in plan or "PartitionFilters: [" in plan
    # pruning proof: only the matching partition's rows are read
    assert scan.count() == 50
    assert "2018" in plan
