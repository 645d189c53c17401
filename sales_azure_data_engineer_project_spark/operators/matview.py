"""Incremental materialized-view maintenance.

A summary table (grouped sums/counts over a fact) maintained from
DELTAS instead of recomputation: on each batch of new fact rows,

    summary' = combine(summary, aggregate(delta))

where combine is a keyed merge adding the partial aggregates.  For
decomposable aggregates (sum/count/min/max) this is exact, and the cost
per batch is O(|delta|) + a keyed merge of |touched groups| — at 100 TB
the difference between a streaming-speed refresh and an hours-long
recompute.  (avg = sum/count derived at read time; non-decomposable
aggregates need sketches or recompute.)

Backed by :class:`..operators.versioned.VersionedTable`, so every
refresh is an atomic commit and summary history is queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .versioned import VersionedTable

__all__ = ["IncrementalSummary"]


class IncrementalSummary:
    """Maintains ``SELECT keys, SUM(each measure), COUNT(*) GROUP BY keys``."""

    def __init__(self, table: VersionedTable, keys: list[str], measures: list[str]):
        self.table = table
        self.keys = keys
        self.measures = measures

    def _aggregate(self, delta: DataFrame) -> DataFrame:
        return delta.groupBy(*self.keys).agg(
            *[F.sum(m).alias(f"sum_{m}") for m in self.measures],
            F.count(F.lit(1)).alias("n_rows"),
        )

    def refresh(self, delta: DataFrame) -> int:
        """Fold one batch of NEW fact rows into the summary (commit)."""
        partial = self._aggregate(delta)
        current = self.table.read()
        if current is None:
            return self.table.overwrite(partial)
        agg_cols = [f"sum_{m}" for m in self.measures] + ["n_rows"]
        combined = (
            current.unionByName(partial)
            .groupBy(*self.keys)
            .agg(*[F.sum(c).alias(c) for c in agg_cols])
        )
        return self.table.overwrite(combined)

    def read(self) -> DataFrame | None:
        return self.table.read()
