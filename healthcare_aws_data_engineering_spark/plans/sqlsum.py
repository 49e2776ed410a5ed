"""Order-independent exact sum helpers shared by the driver-query
modules (neutral home — `testdata_queries` and `analytics_queries` both
need them, and a module-level import either way is circular).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _dsum(expr: str, scale: int = 6) -> str:
    """SQL fragment: order-independent exact sum of a per-row double expr.

    Scale 6 because every per-row expression here is a product of ≤3
    two-decimal factors — exactly representable at 6 decimals, and the double
    sits far closer to that 6-dp value than to any rounding midpoint, so both
    engines' double→decimal casts agree. (Higher scales run into the engines'
    differing shortest-repr vs exact-binary cast digits.)
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE)"


def dsum(col: F.Column, scale: int = 6) -> F.Column:
    """Spark twin of :func:`_dsum`."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")
