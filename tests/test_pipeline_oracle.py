"""Differential test of the WHOLE pipeline against a DuckDB oracle.

Generates a reference-shaped sales CSV (~2,000 rows with the
FIXTURES.md §B dirt profile: near-unique Branch_IDs, ~1.7% empty
DealerNames, non-FD Date_IDs, quoted commas), runs the medallion
pipeline, then recomputes silver + every gold table in DuckDB SQL from
the same CSV and compares row-by-row.

The surrogate-key contract (dense row_number over the natural key,
hazard H2) is deterministic, so even key VALUES must match.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from conftest import write_sales_csv

from sales_azure_data_engineer_project_spark.plans import SalesPipeline


def _gen_rows(n: int = 2000, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    cats = ["BMW", "KIA", "AUDI", "FORD", "TATA"]
    rows = []
    for i in range(n):
        branch = f"BR{i:05d}" if rng.random() > 0.01 else f"BR{rng.randrange(50):05d}"
        dealer = f"DLR{rng.randrange(260):04d}"
        cat = rng.choice(cats)
        model = f"{cat}-M{rng.randrange(60)}"
        rev = rng.randrange(110_000, 30_000_000)
        units = rng.choice([1, 2, 3])
        date_id = f"DT{rng.randrange(1200):05d}"  # deliberately non-FD
        day, month, year = rng.randrange(1, 29), rng.randrange(1, 13), rng.choice(
            [2017, 2018, 2019, 2020]
        )
        bname = f"Branch {branch}"
        dname = "" if rng.random() < 0.017 else (
            f'"Dealer, {dealer}"' if rng.random() < 0.05 else f"Dealer {dealer}"
        )
        pname = f"Product M{model.split('-')[1]}"
        rows.append(
            f"{branch},{dealer},{model},{rev},{units},{date_id},{day},{month},{year},"
            f"{bname},{dname},{pname}"
        )
    return rows


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe_oracle")
    csv = write_sales_csv(str(tmp / "sales.csv"), _gen_rows())
    pipe = SalesPipeline(spark, str(tmp / "zones"))
    out = pipe.run(csv)
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW raw AS
        SELECT * FROM read_csv('{csv}', header=true, quote='"', escape='"',
            nullstr='', columns={{
            'Branch_ID':'VARCHAR','Dealer_ID':'VARCHAR','Model_ID':'VARCHAR',
            'Revenue':'BIGINT','Units_Sold':'BIGINT','Date_ID':'VARCHAR',
            'Day':'BIGINT','Month':'BIGINT','Year':'BIGINT',
            'BranchName':'VARCHAR','DealerName':'VARCHAR','Product_Name':'VARCHAR'}});
        CREATE VIEW silver AS
        SELECT *, string_split(Model_ID,'-')[1] AS model_category,
               Revenue / Units_Sold AS Rev_Per_unit,
               CAST(try_strptime(Year || '-' || Month || '-' || Day, '%Y-%m-%d') AS DATE)::VARCHAR AS date_iso
        FROM raw
        """
    )
    return out, con


def _dim_oracle(con, nk_cols: list[str], attrs: list[str], key: str):
    cols = ", ".join(nk_cols + attrs)
    # surrogate order = ALL natural cols, NULLS FIRST (Spark's asc default)
    order = ", ".join(f"{c} NULLS FIRST" for c in nk_cols + attrs)
    return con.execute(
        f"""
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY {order}) AS BIGINT) AS {key}, {cols}
        FROM (SELECT DISTINCT {cols} FROM silver)
        ORDER BY {key}
        """
    ).fetchall()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_silver_matches_oracle(spark, pipeline_run):
    out, con = pipeline_run
    duck = sorted(
        con.execute(
            "SELECT Branch_ID, Model_ID, model_category, Rev_Per_unit, DealerName"
            " FROM silver ORDER BY ALL"
        ).fetchall()
    )
    got = _rows(out["silver"], ["Branch_ID", "Model_ID", "model_category", "Rev_Per_unit", "DealerName"])
    assert got == duck


@pytest.mark.parametrize(
    "dim,nk,attrs,key",
    [
        ("dim_model", ["Model_ID"], ["model_category"], "dim_model_key"),
        ("dim_branch", ["Branch_ID"], ["BranchName"], "dim_branch_key"),
        ("dim_dealer", ["Dealer_ID"], ["DealerName"], "dim_dealer_key"),
        ("dim_date", ["Date_ID"], [], "dim_date_key"),
        ("dim_calendar", ["Year", "Month", "Day"], ["date_iso"], "dim_calendar_key"),
    ],
)
def test_dimensions_match_oracle(pipeline_run, dim, nk, attrs, key):
    out, con = pipeline_run
    duck = sorted(tuple(r) for r in _dim_oracle(con, nk, attrs, key))
    got = _rows(out[dim], [key, *nk, *attrs])
    assert got == duck, f"{dim} mismatch"


def test_fact_matches_oracle(pipeline_run):
    out, con = pipeline_run
    duck = sorted(
        tuple(r)
        for r in con.execute(
            """
        WITH dm AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY Model_ID, model_category) AS BIGINT) k, Model_ID, model_category
                    FROM (SELECT DISTINCT Model_ID, model_category FROM silver)),
        db AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY Branch_ID, BranchName NULLS FIRST) AS BIGINT) k, Branch_ID, BranchName
               FROM (SELECT DISTINCT Branch_ID, BranchName FROM silver)),
        dd AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY Dealer_ID, DealerName NULLS FIRST) AS BIGINT) k, Dealer_ID, DealerName
               FROM (SELECT DISTINCT Dealer_ID, DealerName FROM silver)),
        dt AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY Date_ID) AS BIGINT) k, Date_ID
               FROM (SELECT DISTINCT Date_ID FROM silver)),
        dc AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY Year, Month, Day) AS BIGINT) k, Year, Month, Day
               FROM (SELECT DISTINCT Year, Month, Day, date_iso FROM silver))
        SELECT dm.k, db.k, dd.k, dt.k, dc.k,
               CAST(SUM(s.Revenue) AS BIGINT), CAST(SUM(s.Units_Sold) AS BIGINT)
        FROM silver s
        JOIN dm ON s.Model_ID = dm.Model_ID
        JOIN db ON s.Branch_ID = db.Branch_ID
        JOIN dd ON s.Dealer_ID = dd.Dealer_ID
        JOIN dt ON s.Date_ID = dt.Date_ID
        JOIN dc ON s.Year = dc.Year AND s.Month = dc.Month AND s.Day = dc.Day
        GROUP BY 1,2,3,4,5
        """
        ).fetchall()
    )
    got = _rows(
        out["factsales"],
        [
            "dim_model_key",
            "dim_branch_key",
            "dim_dealer_key",
            "dim_date_key",
            "dim_calendar_key",
            "Revenue",
            "Units_Sold",
        ],
    )
    assert got == duck
