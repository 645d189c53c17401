"""Named scalar helpers.

Each cites the reference use-site it generalizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["split_part", "safe_div", "dense_surrogate_key", "next_key_offset"]


def split_part(col: Column | str, delim: str, index: int) -> Column:
    """`split(col, delim)[index]` — the model_category derivation at
    `2_Silver_Notebook.py:33` (`split(col('Model_ID'),'-')[0]`)."""
    return F.split(F.col(col) if isinstance(col, str) else col, delim).getItem(index)


def safe_div(num: Column | str, den: Column | str) -> Column:
    """Division with divide-by-zero → NULL, generalizing `Rev_Per_unit`
    at `2_Silver_Notebook.py:49`.  The reference ran Spark 3 non-ANSI
    (x/0 → NULL silently); Spark 4 defaults to ANSI where `/` throws, so
    ``try_divide`` reproduces the reference semantics without turning
    ANSI off globally.  long/long → double either way."""
    num = F.col(num) if isinstance(num, str) else num
    den = F.col(den) if isinstance(den, str) else den
    return F.try_divide(num, den)


def next_key_offset(existing: DataFrame, key_col: str) -> int:
    """A2: current max surrogate key, driver-side scalar.

    Reference: ``select max(dim_model_key)`` then ``.collect()[0][0]+1``
    (`3(1)_Gold_dim_model.py:123-124`).  Returns 0 for an empty
    dimension so that the first assigned key is 1 — unlike the reference,
    whose initial-load seeding (`max_value = 1` at :120-121) starts keys
    at 1 but an incremental first-insert would start at max+1; we make
    both paths produce the same dense sequence (hazard H2).
    """
    row = existing.agg(F.max(key_col).alias("mx")).first()
    mx = row["mx"] if row is not None else None
    return int(mx) if mx is not None else 0


def dense_surrogate_key(
    df: DataFrame, key_col: str, order_cols: list[str], offset: int = 0
) -> DataFrame:
    """Deterministic dense surrogate keys.

    Replaces the reference's ``max_value + monotonically_increasing_id()``
    (`3(1)_Gold_dim_model.py:133`) — non-dense and partition-dependent
    (hazard H2) — with ``row_number().over(Window.orderBy(natural_key))``:
    dense, reproducible, oracle-testable.

    Scale note: an un-partitioned window is a single-reducer sort — fine
    for dimension deltas (new natural keys per batch are small by
    definition), WRONG for billion-row tables; fact tables never get
    surrogate keys this way.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(key_col, (F.row_number().over(w) + F.lit(offset)).cast("long"))
