"""The medallion pipeline driver.

Re-derives the reference's notebook DAG (X2: `1_db` → `2_Silver` →
`3(1..4)` dims → `4_fact`) as a plain Python module: a
:class:`SalesPipeline` that owns zone paths and runs initial or
incremental loads idempotently.

The reference parameterizes runs with a Databricks widget
(`3(1)_Gold_dim_model.py:13-18` ``Incremental_Flag``); here run mode is
inferred from sink existence (S9 ``tableExists``) — the flag's only
real effect, key seeding, is subsumed by ``next_key_offset`` which is
correct in both modes (hazard H2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import PathCatalog
from ..functions.scalar import safe_div, split_part
from ..io import read_csv, read_parquet, write_parquet
from ..operators.dimensions import DimensionSpec, build_scd1_dimension
from ..operators.fact import aggregate_to_grain
from ..operators.fact import build_fact as assemble_fact
from ..operators.upsert import merge_write_parquet
from ..operators.versioned import VersionedTable
from ..schemas import RAW_SALES_SCHEMA

__all__ = ["SalesPipeline", "transform_silver", "DIM_SPECS"]

# The four reference dimensions (3(1..4)_Gold_dim_*.py:44-46) + grain.
DIM_SPECS: dict[str, DimensionSpec] = {
    "dim_model": DimensionSpec("dim_model", "dim_model_key", "Model_ID", ("model_category",)),
    "dim_branch": DimensionSpec("dim_branch", "dim_branch_key", "Branch_ID", ("BranchName",)),
    "dim_dealer": DimensionSpec("dim_dealer", "dim_dealer_key", "Dealer_ID", ("DealerName",)),
    # Reference parity: dim_date keeps only Date_ID (`3(4)_Gold_dim_date.py:44-46`).
    "dim_date": DimensionSpec("dim_date", "dim_date_key", "Date_ID", ()),
    # Hazard H1 fix: Date_ID does NOT determine (Day,Month,Year) in the
    # reference data, so gold cannot answer calendar questions through
    # dim_date.  A real calendar dimension keyed on the (Year,Month,Day)
    # composite closes that gap (SURVEY §7 Phase 3).
    "dim_calendar": DimensionSpec(
        "dim_calendar", "dim_calendar_key", ("Year", "Month", "Day"), ("date_iso",)
    ),
}

FACT_GRAIN = [
    "dim_model_key",
    "dim_branch_key",
    "dim_dealer_key",
    "dim_date_key",
    "dim_calendar_key",
]


def transform_silver(df: DataFrame) -> DataFrame:
    """Bronze → silver enrichment (`2_Silver_Notebook.py:33,49`).

    - ``model_category`` = prefix of ``Model_ID`` before '-'
    - ``Rev_Per_unit``   = Revenue / Units_Sold (long/long → double)

    The reference's display-only string cast of Units_Sold
    (`2_Silver_Notebook.py:45`) is deliberately NOT applied — it never
    reaches the persisted silver table (SURVEY §1.3).
    """
    return (
        df.withColumn("model_category", split_part("Model_ID", "-", 0))
        .withColumn("Rev_Per_unit", safe_div("Revenue", "Units_Sold"))
        # engine enrichment (not in the reference): a true calendar date
        # assembled from the pre-split Day/Month/Year ints, feeding
        # dim_calendar (hazard H1); try_to_date → NULL on invalid dates
        .withColumn(
            "date_iso",
            F.expr(
                "try_to_date(concat_ws('-', Year, Month, Day), 'y-M-d')"
            ).cast("string"),
        )
    )


class SalesPipeline:
    """Zone layout: ``root/{bronze,silver,gold}``.

    - silver is hive-partitioned on ``Year`` so calendar-filtered scans
      prune whole directories (the first-order optimization at scale).
    - gold tables are :class:`VersionedTable`s by default: every MERGE
      is an atomic versioned commit (Delta-``_delta_log`` semantics —
      readers see old or new, never partial; history queryable).
      ``versioned=False`` falls back to the directory-swap writer.
    """

    def __init__(self, spark: SparkSession, root: str, *, versioned: bool = True):
        self.spark = spark
        self.root = root
        self.versioned = versioned
        self.bronze = os.path.join(root, "bronze")
        self.silver = os.path.join(root, "silver", "carsales")
        self.gold = os.path.join(root, "gold")
        self.catalog = PathCatalog(spark, root)
        self.catalog.create_schema("gold")  # S8 (`1_db_Notebook.py:24,29`)

    # -- zone paths -------------------------------------------------------
    def gold_path(self, table: str) -> str:
        return os.path.join(self.gold, table)

    def gold_table(self, table: str) -> VersionedTable:
        return VersionedTable(self.spark, self.gold_path(table))

    def read_gold(self, table: str, version: int | None = None) -> DataFrame | None:
        if self.versioned:
            return self.gold_table(table).read(version)
        p = self.gold_path(table)
        if os.path.isdir(p):
            return self.spark.read.parquet(p)
        return None

    def _write_gold(self, df: DataFrame, table: str, keys: list[str]) -> None:
        if self.versioned:
            self.gold_table(table).merge(df, keys)
        else:
            merge_write_parquet(self.spark, df, self.gold_path(table), keys=keys)

    # -- stages -----------------------------------------------------------
    def ingest_bronze(self, csv_path: str) -> DataFrame:
        """S4: land raw CSV as bronze parquet with the explicit schema."""
        raw = read_csv(self.spark, csv_path, schema=RAW_SALES_SCHEMA)
        write_parquet(raw, self.bronze)
        return read_parquet(self.spark, self.bronze)

    def build_silver(self) -> DataFrame:
        silver = transform_silver(read_parquet(self.spark, self.bronze))
        write_parquet(silver, self.silver, partition_by=["Year"])
        return read_parquet(self.spark, self.silver)

    def build_dimensions(self, silver: DataFrame) -> dict[str, DataFrame]:
        dims: dict[str, DataFrame] = {}
        for name, spec in DIM_SPECS.items():
            sink = self.read_gold(name)
            dim = build_scd1_dimension(silver, sink, spec)
            self._write_gold(dim, name, keys=[spec.key_col])
            dims[name] = self.read_gold(name)
        return dims

    def build_fact(self, silver: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
        fact = assemble_fact(
            silver, {n: (df, DIM_SPECS[n]) for n, df in dims.items()}
        )
        fact = aggregate_to_grain(fact, FACT_GRAIN)
        self._write_gold(fact, "factsales", keys=FACT_GRAIN)
        return self.read_gold("factsales")

    def run(self, csv_path: str) -> dict[str, DataFrame]:
        """One full load (initial or incremental — same code path)."""
        self.ingest_bronze(csv_path)
        silver = self.build_silver()
        dims = self.build_dimensions(silver)
        fact = self.build_fact(silver, dims)
        for t in [*dims, "factsales"]:  # S3: SQL-addressable gold
            self.read_gold(t).createOrReplaceTempView(
                self.catalog.view_name("gold", t)
            )
        return {**dims, "factsales": fact, "silver": silver}

    # -- data-quality surface ---------------------------------------------
    def quality_report(self) -> dict[str, dict[str, int]]:
        """Expectation checks over silver + gold (the validation layer
        the reference lacks — its dirt flows to gold unexamined).
        Returns {table: {expectation: violation_count}}; callers decide
        warn-vs-fail (the reference data legitimately violates
        not_null(DealerName) 31 times)."""
        from ..operators import quality as Q

        silver = read_parquet(self.spark, self.silver)
        fact = self.read_gold("factsales")
        report = {
            "silver": Q.check(
                silver,
                [
                    Q.not_null("Branch_ID"),
                    Q.not_null("DealerName"),
                    Q.in_range("Units_Sold", 1, 3),
                    Q.matches("Model_ID", "^[A-Za-z]+-?M?"),
                ],
            )
        }
        if fact is not None:
            checks = [Q.unique(*FACT_GRAIN)]
            for name, spec in DIM_SPECS.items():
                dim = self.read_gold(name)
                if dim is not None:
                    checks.append(Q.references(dim, spec.key_col))
            report["factsales"] = Q.check(fact, checks)
        return report

    # -- reference's one analytics query ---------------------------------
    def units_by_branch_year(self, silver: DataFrame | None = None) -> DataFrame:
        """`2_Silver_Notebook.py:63`: groupBy(BranchName, Year).sum(Units)
        sorted by Year asc, total desc (A1 + O1)."""
        silver = silver if silver is not None else read_parquet(self.spark, self.silver)
        return (
            silver.groupBy("BranchName", "Year")
            .agg(F.sum("Units_Sold").alias("Total_Units_Sold"))
            .orderBy(F.col("Year").asc(), F.col("Total_Units_Sold").desc())
        )
