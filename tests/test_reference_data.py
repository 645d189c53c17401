"""End-to-end parity on the REFERENCE'S OWN raw data.

Runs the engine's medallion pipeline over
/root/reference/RawData/SalesData.csv (1,849 rows, UTF-8 BOM, CRLF) and
IncrementalSales.csv (4 rows incl. the adversarial XYZ row and a
quoted-comma dealer name) — the exact inputs the reference's notebooks
process — and asserts the documented data profile (SURVEY §1.2/§5)
survives our ingest + star build.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sales_azure_data_engineer_project_spark.plans import SalesPipeline

REF = "/root/reference/RawData"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/SalesData.csv"), reason="reference data not present"
)


@pytest.fixture(scope="module")
def ref_pipeline(spark, tmp_path_factory):
    pipe = SalesPipeline(spark, str(tmp_path_factory.mktemp("refzones")))
    initial = pipe.run(f"{REF}/SalesData.csv")
    return pipe, initial


def test_reference_initial_profile(spark, ref_pipeline):
    pipe, out = ref_pipeline
    silver = out["silver"]
    # SURVEY §1.2 documented profile
    assert silver.count() == 1849
    assert silver.select("Model_ID").distinct().count() == 277
    assert silver.select("Branch_ID").distinct().count() == 1836
    assert silver.select("Date_ID").distinct().count() == 1156
    # 31 empty DealerNames land as NULL (SalesData.csv:38 etc.)
    assert silver.filter(F.col("DealerName").isNull()).count() == 31
    # BOM did not mangle the first column
    assert silver.filter(F.col("Branch_ID") == "BR0001").count() > 0
    # silver derivations
    row = silver.filter("Branch_ID = 'BR0001' AND Date_ID = 'DT00001'").first()
    assert row["model_category"] == "BMW"
    assert row["Rev_Per_unit"] == row["Revenue"] / row["Units_Sold"]


def test_reference_dims_dense_and_consistent(ref_pipeline):
    pipe, out = ref_pipeline
    for name, key in [
        ("dim_model", "dim_model_key"),
        ("dim_branch", "dim_branch_key"),
        ("dim_dealer", "dim_dealer_key"),
        ("dim_date", "dim_date_key"),
        ("dim_calendar", "dim_calendar_key"),
    ]:
        dim = out[name]
        n = dim.count()
        keys = sorted(r[key] for r in dim.select(key).collect())
        assert keys == list(range(1, n + 1)), f"{name} keys not dense"
    assert out["dim_model"].count() == 277
    assert out["dim_date"].count() == 1156


def test_reference_fact_resolves_every_row(ref_pipeline):
    pipe, out = ref_pipeline
    fact = out["factsales"]
    for k in [
        "dim_model_key",
        "dim_branch_key",
        "dim_dealer_key",
        "dim_date_key",
        "dim_calendar_key",
    ]:
        assert fact.filter(F.col(k).isNull()).count() == 0, f"unresolved {k}"
    # measures conserved through grain aggregation
    assert (
        fact.agg(F.sum("Revenue")).first()[0]
        == out["silver"].agg(F.sum("Revenue")).first()[0]
    )


def test_reference_incremental_run(spark, ref_pipeline):
    pipe, _ = ref_pipeline
    before_models = pipe.read_gold("dim_model").count()
    out2 = pipe.run(f"{REF}/IncrementalSales.csv")

    # quoted-comma dealer name parsed intact (IncrementalSales.csv:2)
    dealers = {r["DealerName"] for r in out2["dim_dealer"].collect()}
    assert "Fisker, Karma Motors" in dealers

    # adversarial row (IncrementalSales.csv:5) got new dense keys
    models = {r["Model_ID"]: r["dim_model_key"] for r in out2["dim_model"].collect()}
    assert "ZYXM13" in models
    assert models["ZYXM13"] > before_models - 1

    # MERGE never deletes: all 277 original models still present
    assert out2["dim_model"].count() >= 277

    # idempotency on the reference increment
    snap = sorted(map(str, pipe.read_gold("factsales").collect()))
    pipe.run(f"{REF}/IncrementalSales.csv")
    assert sorted(map(str, pipe.read_gold("factsales").collect())) == snap


def test_reference_quality_report(ref_pipeline):
    """The validation layer quantifies the reference data's dirt instead
    of letting it flow silently.  (Runs after the incremental tests, so
    silver holds the 4-row increment; the initial load's 31 NULL
    DealerNames are asserted in test_reference_initial_profile.)"""
    pipe, _ = ref_pipeline
    report = pipe.quality_report()
    assert report["silver"]["not_null(Branch_ID)"] == 0
    assert report["silver"]["in_range(Units_Sold,[1,3])"] == 0
    fact = report["factsales"]
    # star integrity holds over the CUMULATIVE gold state: fact grain
    # unique, every surrogate key resolves in its dimension
    assert all(v == 0 for v in fact.values()), fact
