"""Catalog + extra source format tests (S3/S8/S9, JSON/ORC round-trips,
calendar dimension)."""

from __future__ import annotations

from conftest import INITIAL_ROWS, write_sales_csv

from sales_azure_data_engineer_project_spark import sources
from sales_azure_data_engineer_project_spark.catalog import PathCatalog
from sales_azure_data_engineer_project_spark.plans import SalesPipeline


def test_catalog_lifecycle(spark, tmp_path):
    cat = PathCatalog(spark, str(tmp_path))
    cat.create_schema("gold")
    assert not cat.table_exists("gold", "t")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    df.write.parquet(cat.path("gold", "t"))
    assert cat.table_exists("gold", "t")
    cat.register("gold", "t")
    assert spark.sql("SELECT v FROM gold_t").first()["v"] == "a"
    assert cat.read("gold", "missing") is None


def test_pipeline_registers_gold_views(spark, tmp_path):
    csv = write_sales_csv(str(tmp_path / "init.csv"), INITIAL_ROWS)
    pipe = SalesPipeline(spark, str(tmp_path / "zones"))
    pipe.run(csv)
    # the reference's verification cells (`4_fact:85-86`) as SQL-by-name
    n = spark.sql(
        "SELECT count(*) AS n FROM gold_factsales f "
        "JOIN gold_dim_branch b ON f.dim_branch_key = b.dim_branch_key"
    ).first()["n"]
    assert n == 4


def test_calendar_dimension_h1(spark, tmp_path):
    """Date_ID does not determine (Day,Month,Year) — dim_calendar must
    key on the composite and answer calendar questions."""
    csv = write_sales_csv(str(tmp_path / "init.csv"), INITIAL_ROWS)
    pipe = SalesPipeline(spark, str(tmp_path / "zones"))
    out = pipe.run(csv)
    cal = {
        (r["Year"], r["Month"], r["Day"]): (r["dim_calendar_key"], r["date_iso"])
        for r in out["dim_calendar"].collect()
    }
    # DT00001 appears with two different dates → two calendar rows
    assert (2017, 1, 1) in cal and (2017, 5, 10) in cal
    assert cal[(2017, 1, 1)][1] == "2017-01-01"
    keys = sorted(k for k, _ in cal.values())
    assert keys == list(range(1, len(cal) + 1))
    # fact carries the calendar key; every row resolves
    assert out["factsales"].filter("dim_calendar_key IS NULL").count() == 0


def test_json_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    jp, op = str(tmp_path / "j"), str(tmp_path / "o")
    sources.write_json(df, jp)
    sources.write_orc(df, op)
    back_j = sources.read_json(spark, jp, schema="k long, v string")
    back_o = sources.read_orc(spark, op)
    assert sorted((r["k"], r["v"]) for r in back_j.collect()) == [(1, "x"), (2, "y")]
    assert sorted((r["k"], r["v"]) for r in back_o.collect()) == [(1, "x"), (2, "y")]


def test_binary_file_source(spark, tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01payload")
    out = sources.read_text_as_binary(spark, str(p)).first()
    assert bytes(out["content"]) == b"\x00\x01payload"
    assert out["length"] == 9


def test_csv_permissive_with_malformed_rows(spark, tmp_path):
    """PERMISSIVE mode: malformed rows land as NULL-padded rows instead of
    failing the load (the reference implicitly relied on ADF cleaning;
    our ingest must survive dirt on its own)."""
    from sales_azure_data_engineer_project_spark.io import read_csv
    from sales_azure_data_engineer_project_spark.schemas import RAW_SALES_SCHEMA

    p = tmp_path / "dirty.csv"
    p.write_text(
        "Branch_ID,Dealer_ID,Model_ID,Revenue,Units_Sold,Date_ID,Day,Month,Year,"
        "BranchName,DealerName,Product_Name\n"
        "BR1,DLR1,BMW-M1,100,1,DT1,1,1,2017,B,D,P\n"
        "BR2,DLR2,KIA-M2,notanumber,2,DT2,2,2,2018,B2,D2,P2\n"  # bad Revenue
    )
    df = read_csv(spark, str(p), schema=RAW_SALES_SCHEMA)
    rows = {r["Branch_ID"]: r for r in df.collect()}
    assert rows["BR1"]["Revenue"] == 100
    assert rows["BR2"]["Revenue"] is None  # malformed cell → NULL, row kept
    assert rows["BR2"]["Units_Sold"] == 2


def test_load_testdata_self_defends_session_confs(spark, sf_smoke):
    """Regression guard: queries must repair TZ/nanos confs on any
    caller-provided session (the driver builds its own)."""
    from sales_azure_data_engineer_project_spark.io import load_testdata

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load_testdata(spark, sf_smoke, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_unity_path_catalog_three_level(spark, tmp_path):
    """The reference's 3-part Unity calls translate 1:1:
    CREATE CATALOG → create schema cat.gold → write → tableExists →
    SQL-addressable view (`1_db_Notebook.py:8,24,29`,
    `3(1)_Gold_dim_model.py:56,173-176`)."""
    from sales_azure_data_engineer_project_spark.catalog import UnityPathCatalog

    uc = UnityPathCatalog(spark, str(tmp_path))
    uc.create_catalog("cars_catalog")
    uc.create_schema("cars_catalog.silver")
    uc.create_schema("cars_catalog.gold")

    assert not uc.table_exists("cars_catalog.gold.dim_model")
    df = spark.createDataFrame([(1, "BMW-M1"), (2, "KIA-K4")], ["k", "model"])
    df.write.mode("overwrite").parquet(uc.path("cars_catalog.gold.dim_model"))
    assert uc.table_exists("cars_catalog.gold.dim_model")
    assert not uc.table_exists("other_catalog.gold.dim_model")

    uc.register("cars_catalog.gold.dim_model")
    got = spark.sql(
        "select count(*) as n from cars_catalog_gold_dim_model"
    ).first()["n"]
    assert got == 2

    # a fresh instance rediscovers catalogs from disk (cross-session)
    uc2 = UnityPathCatalog(spark, str(tmp_path))
    assert uc2.table_exists("cars_catalog.gold.dim_model")
    assert uc2.read("cars_catalog.gold.dim_model").count() == 2
