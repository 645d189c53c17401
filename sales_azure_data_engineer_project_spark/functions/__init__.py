"""Scalar/function library (SURVEY §2.7).

Everything here is a thin, named, unit-testable composition of built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd.  No Python
UDFs (the reference also has zero UDFs, SURVEY §2.10).
"""

from .scalar import (
    safe_div,
    split_part,
    dense_surrogate_key,
    next_key_offset,
)

__all__ = [
    "safe_div",
    "split_part",
    "dense_surrogate_key",
    "next_key_offset",
]
