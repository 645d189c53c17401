"""Pipeline orchestration (reference operator X2: notebook sequencing)."""

from .pipeline import SalesPipeline, transform_silver, DIM_SPECS

__all__ = ["SalesPipeline", "transform_silver", "DIM_SPECS"]
