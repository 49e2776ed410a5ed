"""CASE-ladder builders for clinical banding (SURVEY §2.8 F9/F14/F15).

Order of legs is semantics — first match wins, NULL checks first
(``Athena_queries_for_reports.sql:36-74, 117-151``; SURVEY §7.4.3). These are
pure Column expressions: they stay inside whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def case_ladder(legs: Sequence[tuple[Column, object]], otherwise=None) -> Column:
    """Build ``CASE WHEN c1 THEN v1 WHEN c2 THEN v2 ... [ELSE o] END``
    preserving leg order exactly."""
    expr: Column | None = None
    for cond, value in legs:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    if expr is None:
        raise ValueError("case_ladder needs at least one leg")
    return expr if otherwise is None else expr.otherwise(otherwise)


def risk_prob_band(prob: Column) -> Column:
    """``<0.25`` → Low, ``<0.5`` → Moderate, else High
    (``test.py:157-163``, F15)."""
    return case_ladder(
        [(prob < 0.25, F.lit("Low")), (prob < 0.5, F.lit("Moderate"))],
        otherwise=F.lit("High"),
    )


def range_status_with_margins(value: Column, low: float, high: float) -> Column:
    """5-way range status with 10%/20% margins (``test.py:166-183``, F14):
    ``<0.9*low`` Low, ``<low`` Borderline low, ``<=high`` In range,
    ``<=1.2*high`` Borderline high, else High; NULL → Unknown."""
    return case_ladder(
        [
            (value.isNull(), F.lit("Unknown")),
            (value < 0.9 * low, F.lit("Low")),
            (value < low, F.lit("Borderline low")),
            (value <= high, F.lit("In range")),
            (value <= 1.2 * high, F.lit("Borderline high")),
        ],
        otherwise=F.lit("High"),
    )
