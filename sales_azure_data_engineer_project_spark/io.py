"""Sources & sinks (SURVEY §2.1 S1–S10).

The reference's zones are ADLS paths read/written with format strings
(`2_Silver_Notebook.py:7-9,72-75`, `3(1)_Gold_dim_model.py:173-176`).
Here each zone is a local/posix (or any Hadoop-FS) directory; the
semantics — overwrite silver, create-or-merge gold — live in
``operators.upsert``, not in the writer.

Scale notes:
- Parquet reads are vectorized and get predicate pushdown + column
  pruning for free as long as callers filter/select on the DataFrame
  (never ``.collect()`` then filter).
- Writers repartition only when asked; a 100 TB fact write should keep
  the upstream partitioning (one shuffle saved) and let AQE size files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TESTDATA_TABLES

__all__ = [
    "read_parquet",
    "read_csv",
    "write_parquet",
    "write_bucketed_table",
    "load_testdata",
    "register_testdata_views",
]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1: parquet directory scan (`2_Silver_Notebook.py:7-9`).

    The reference passes ``inferSchema`` — a no-op for self-describing
    Parquet (hazard H6); we drop it.
    """
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S4: CSV landing source with the reference data's quirks.

    /root/reference/RawData/SalesData.csv has a UTF-8 BOM on line 1,
    quoted fields with embedded commas (IncrementalSales.csv:2
    ``"Fisker, Karma Motors"``), and empty strings for missing
    DealerName (SalesData.csv:38).  ``emptyValue=None`` maps empties to
    SQL NULL so the cleansing layer sees them.
    """
    reader = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", "UTF-8")
        .option("emptyValue", None)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S5: parquet sink (`2_Silver_Notebook.py:72-75`).

    ``partition_by`` hive-partitions the layout; filters on those
    columns then prune whole directories at scan time (PartitionFilters
    in the plan) — the first-order scan optimization at 100 TB."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame, name: str, keys: list[str], buckets: int = 32
) -> None:
    """Bucketed managed table: co-locates future joins/aggregations on
    ``keys`` without a shuffle (SortMergeJoin with both sides bucketed
    reads straight from disk layout).

    The 100 TB pattern for repeatedly-joined facts: pay one layout
    shuffle at write, skip the exchange on every read."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist; clear any orphaned location
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if warehouse:
        shutil.rmtree(os.path.join(warehouse, name.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(name)
    )


def load_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-corpus table (TESTDATA.md).

    ``events.ts`` has shipped in two parquet encodings across driver
    rounds, both normalized here to TIMESTAMP (instant) in UTC — the
    type every downstream query (unix_micros, window, date_trunc) and
    the zone-naive DuckDB oracle agree on:

    - TIMESTAMP(NANOS): illegal for Spark's reader, so the session
      reads nanos as long (``spark.sql.legacy.parquet.nanosAsLong``)
      and we rebuild a microsecond timestamp (truncation, matching
      DuckDB's CAST(ts_ns AS TIMESTAMP)).
    - naive timestamp[us] (isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ by default; ``_ensure_session_confs`` disables the
      inference so the wall-clock values read as UTC instants, with a
      cast fallback below if that conf is locked down (cast interprets
      NTZ in the session zone, which we force to UTC — same instants).
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division — double division would lose precision on
            # 1.7e18-scale nanosecond epochs (doubles carry 53 bits)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make corpus queries correct on ANY caller-provided session.

    The driver contract hands our queries an externally-built
    SparkSession, so the two session settings correctness depends on are
    (re)applied at runtime — both are dynamic SQL confs:

    - UTC session timezone: year()/date_trunc() etc. render instants in
      the session zone; the DuckDB oracle is zone-naive (UTC).
    - nanosAsLong: round-1 events parquet stored TIMESTAMP(NANOS),
      which the reader otherwise rejects outright.
    - inferTimestampNTZ off: round-2 events parquet stores naive
      timestamp[us]; without inference it reads as a UTC instant
      (TIMESTAMP), the type unix_micros()/window() require and the
      semantics the zone-naive oracle assumes.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — a locked-down conf is non-fatal
            pass


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """S2-equivalent: make every corpus table SQL-addressable by name."""
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            load_testdata(spark, sf_dir, t).createOrReplaceTempView(t)
