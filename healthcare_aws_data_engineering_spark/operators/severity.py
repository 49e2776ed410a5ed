"""Severity-ranked lab selection (SURVEY §2.6 O3; reference
``test.py:528-552``): given per-(patient, analyte) latest values with
reference ranges, band each value (F14), rank by severity
(High/Low → 0, Borderline → 1, In range → 2, Unknown → 3), keep the
abnormal rows — falling back to borderline rows when a patient has no
abnormal labs — and return at most ``k`` per patient, worst first.

Distributed shape: banding is a projection; the per-patient "has any
abnormal" flag is a window max over the patient partition (no extra
shuffle beyond the ranking window's); top-k is row_number ≤ k. One
shuffle total, no driver-side loops (the reference does this in pandas
for one patient at a time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions.banding import range_status_with_margins

SEVERITY_RANK = {
    "High": 0,
    "Low": 0,
    "Borderline high": 1,
    "Borderline low": 1,
    "In range": 2,
    "Unknown": 3,
}


def severity_rank(status: Column) -> Column:
    """Status → severity rank (test.py:528-533's mapping; first-match CASE
    so the oracle twin is a plain CASE expression)."""
    expr = None
    for s, r in SEVERITY_RANK.items():
        expr = F.when(status == s, r) if expr is None else expr.when(status == s, r)
    return expr.otherwise(F.lit(3))


def severity_topk(
    labs: DataFrame,
    ranges: dict[str, tuple[float, float]],
    k: int = 6,
    patient_col: str = "patient_id",
    analyte_col: str = "analyte",
    value_col: str = "value",
) -> DataFrame:
    """Top-k most severe labs per patient.

    ``ranges``: analyte → (low, high) reference interval; analytes absent
    from the map band as Unknown (rank 3) and never surface unless the
    patient has nothing else."""
    status = None
    for analyte, (lo, hi) in ranges.items():
        banded = range_status_with_margins(F.col(value_col), lo, hi)
        status = (
            F.when(F.col(analyte_col) == analyte, banded)
            if status is None
            else status.when(F.col(analyte_col) == analyte, banded)
        )
    status = status.otherwise(F.lit("Unknown")) if status is not None else F.lit("Unknown")

    df = labs.withColumn("status", status).withColumn(
        "severity", severity_rank(F.col("status"))
    )
    wp = W.partitionBy(patient_col)
    df = df.withColumn(
        "__min_sev", F.min("severity").over(wp)
    )
    # abnormal rows when any exist for the patient; else borderline rows
    # (test.py:539-546's fallback); In range/Unknown never selected unless
    # nothing else exists for the patient
    kept = df.filter(
        (F.col("severity") == 0)
        | ((F.col("__min_sev") > 0) & (F.col("severity") == F.col("__min_sev")))
    )
    order = W.partitionBy(patient_col).orderBy(
        F.col("severity").asc(), F.col(analyte_col).asc()
    )
    return (
        kept.withColumn("rank", F.row_number().over(order))
        .filter(F.col("rank") <= k)
        .drop("__min_sev")
    )
