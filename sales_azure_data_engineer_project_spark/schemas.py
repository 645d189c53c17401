"""Explicit schemas.

The reference never declares a schema — bronze reads pass a no-op
``inferSchema`` on Parquet (`2_Silver_Notebook.py:8`) and the real CSV
inference happened in Azure Data Factory outside the repo (SURVEY §1.4,
hazard H6).  We declare every schema so ingest is deterministic and
testable.

Types follow SURVEY §1.2: the raw sales table is flat
string/long/double; silver adds ``model_category`` (string) and
``Rev_Per_unit`` (double, long/long division).
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "RAW_SALES_SCHEMA",
    "SILVER_SALES_SCHEMA",
    "TESTDATA_TABLES",
    "dim_schema",
    "FACT_SALES_SCHEMA",
]

# ---------------------------------------------------------------------------
# Sales pipeline (mirrors /root/reference/RawData/SalesData.csv:1 header)
# ---------------------------------------------------------------------------

RAW_SALES_SCHEMA = T.StructType(
    [
        T.StructField("Branch_ID", T.StringType(), True),
        T.StructField("Dealer_ID", T.StringType(), True),
        T.StructField("Model_ID", T.StringType(), True),
        T.StructField("Revenue", T.LongType(), True),
        T.StructField("Units_Sold", T.LongType(), True),
        T.StructField("Date_ID", T.StringType(), True),
        T.StructField("Day", T.LongType(), True),
        T.StructField("Month", T.LongType(), True),
        T.StructField("Year", T.LongType(), True),
        T.StructField("BranchName", T.StringType(), True),
        T.StructField("DealerName", T.StringType(), True),
        T.StructField("Product_Name", T.StringType(), True),
    ]
)

SILVER_SALES_SCHEMA = T.StructType(
    list(RAW_SALES_SCHEMA.fields)
    + [
        T.StructField("model_category", T.StringType(), True),
        T.StructField("Rev_Per_unit", T.DoubleType(), True),
    ]
)


def dim_schema(key_col: str, natural_cols: list[tuple[str, T.DataType]]) -> T.StructType:
    """Gold dimension schema: surrogate key + natural-key/attribute columns.

    Mirrors the shape produced at `3(1)_Gold_dim_model.py:133` (key appended
    by withColumn) but with the key FIRST for readability.
    """
    return T.StructType(
        [T.StructField(key_col, T.LongType(), False)]
        + [T.StructField(n, t, True) for n, t in natural_cols]
    )


FACT_SALES_SCHEMA = T.StructType(
    [
        T.StructField("Revenue", T.LongType(), True),
        T.StructField("Units_Sold", T.LongType(), True),
        T.StructField("Rev_Per_Unit", T.DoubleType(), True),
        T.StructField("dim_model_key", T.LongType(), True),
        T.StructField("dim_branch_key", T.LongType(), True),
        T.StructField("dim_dealer_key", T.LongType(), True),
        T.StructField("dim_date_key", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver test corpus (/root/testdata/sf*/ — FIXTURES.md §A)
# ---------------------------------------------------------------------------

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
