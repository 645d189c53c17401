"""Source/sink connectors (SURVEY §2.1).

Parquet and the reference's quirk-handling CSV reader live in ``..io``
(re-exported here); this package adds the standard lake formats a
complete engine needs — JSON (schema-enforced), ORC — and the
binary-file pattern for multimodal payloads.  Delta/Iceberg need jars
not present in this environment; the MERGE semantics they would supply
are implemented relationally in ``operators.upsert``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_csv, read_parquet, write_parquet

__all__ = [
    "read_csv",
    "read_parquet",
    "write_parquet",
    "read_json",
    "write_json",
    "read_orc",
    "write_orc",
    "read_text_as_binary",
]


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON lines source.  Always pass a schema in production — inference
    scans the data twice and types drift (same reasoning as hazard H6)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_text_as_binary(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file binary ingestion (multimodal payload pattern):
    (path, modificationTime, length, content binary)."""
    return spark.read.format("binaryFile").load(path)
