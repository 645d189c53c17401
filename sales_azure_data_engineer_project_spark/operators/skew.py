"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in ``session.py``) handles most
runtime skew; these helpers cover the two patterns AQE can't fix:

- **salted aggregation** — a hot groupBy key that funnels into one
  reducer.  Two-phase: pre-aggregate on (key, salt) — map-side combine
  already shrinks it — then final-aggregate on key.  Exact for
  decomposable aggregates (sum/count/min/max).
- **salted join** — a hot join key against a medium dimension too big
  to broadcast: replicate the dimension ``buckets``× with an explicit
  salt, salt the fact rows deterministically, join on (key, salt).
  Each reducer sees 1/buckets of the hot key's rows.

Salts are deterministic (hash of a caller-chosen unique column, pmod
buckets) so results are reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_sum", "salted_join"]


def _salt(unique_col: str, buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)).cast("int")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    *,
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe grouped sum: ``sums`` maps input column →
    output alias.  Equivalent to ``df.groupBy(keys).sum(...)`` for any
    decomposable aggregate, but the heavy shuffle carries (key, salt)."""
    salted = df.withColumn("__salt", _salt(salt_from, buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(c).alias(a) for c, a in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(a).alias(a) for a in sums.values()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_from: str,
    buckets: int = 8,
    how: str = "left",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``small`` per salt bucket, salt
    ``big`` deterministically, join on (key, salt).

    Row-for-row equivalent to ``big.join(small, on, how)`` when ``on``
    is unique in ``small`` (the dimension-lookup contract)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    small_rep = small.withColumn("__salt", salts)
    big_salted = big.withColumn("__salt", _salt(salt_from, buckets))
    return big_salted.join(small_rep, on=[on, "__salt"], how=how).drop("__salt")
