"""SCD-Type-1 MERGE (upsert) semantics without Delta.

The reference upserts gold tables with Delta MERGE
(`3(1)_Gold_dim_model.py:163-169` ``whenMatchedUpdateAll /
whenNotMatchedInsertAll``; `4_Gold_fact_sales_table.py:68-74`).
delta-spark is not on this classpath, so we implement the same
*semantics* relationally and commit with an atomic directory swap:

    merged = source ∪ (target ⟕anti source on merge keys)

- every target row whose key matches a source row is replaced by the
  source row (== whenMatchedUpdateAll),
- every non-matching source row is appended (== whenNotMatchedInsertAll),
- every non-matching target row is kept.

Hazard H4 (SURVEY §4.3): Delta MERGE *fails* when multiple source rows
match one target key.  We surface the same contract via
``assert_unique`` (default on for dimensions, handled by pre-aggregation
for facts).

Scale notes:
- The anti-join shuffles on the merge keys — unavoidable for a keyed
  upsert; at cluster scale target AND source should be bucketed on the
  merge keys so the anti-join is shuffle-free.  Delta/Iceberg would add
  file-level pruning; the relational core is identical.
- The swap rewrites the whole table.  That is also what Delta MERGE does
  in the worst case (all files touched); partition the gold table on a
  stable column and merge per-partition for bounded rewrites at 100 TB.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "merge_write_parquet"]


def merge_upsert(
    target: DataFrame | None,
    source: DataFrame,
    keys: list[str],
    *,
    assert_unique: bool = True,
    evolve_schema: bool = False,
) -> DataFrame:
    """Relational SCD-1 merge: source wins on key match, others kept.

    ``target=None`` means initial load (`tableExists` false branch,
    `3(1)_Gold_dim_model.py:171-176`): result is just the source.

    ``evolve_schema=True`` = Delta's ``mergeSchema``/autoMerge: columns
    new in the source are added to the table (NULL for untouched target
    rows); columns missing from the source stay, NULL on inserted rows.
    Off by default — silent schema drift should be an explicit opt-in.
    """
    if assert_unique:
        dup = (
            source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"merge source has duplicate merge keys {keys}; Delta MERGE "
                "would raise 'multiple source rows matched' (SURVEY H4). "
                "Aggregate to the merge grain first."
            )
    if target is None:
        return source
    if evolve_schema:
        source = _align_evolved(source, target)
        target = _align_evolved(target, source)
    else:
        source = source.select(*target.columns)  # align column order (H7)
    kept = target.join(source.select(*keys), on=keys, how="left_anti")
    return source.unionByName(kept)


def _align_evolved(df: DataFrame, other: DataFrame) -> DataFrame:
    """Add ``other``'s missing columns to ``df`` as typed NULLs."""
    have = set(df.columns)
    extra = [f for f in other.schema.fields if f.name not in have]
    for f in extra:
        df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df


def merge_write_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    *,
    assert_unique: bool = True,
) -> None:
    """MERGE INTO a parquet directory with an atomic-ish swap commit.

    Reads current target (if any), computes the merged relation, writes
    to a staging dir, then swaps.  The read must be fully materialized
    before the target dir is replaced, hence the staging write.
    """
    exists = os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    target = spark.read.parquet(path) if exists else None
    merged = merge_upsert(target, source, keys, assert_unique=assert_unique)
    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    if exists:
        old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        os.rename(staging, path)
