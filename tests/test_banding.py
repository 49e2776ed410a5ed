from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.functions.banding import (
    case_ladder,
    range_status_with_margins,
    risk_prob_band,
)


def _eval(spark, col, values, schema="v double"):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r.out for r in df.select(col.alias("out")).collect()]


def test_case_ladder_first_match_wins(spark):
    col = case_ladder(
        [(F.col("v") < 10, F.lit("small")), (F.col("v") < 20, F.lit("medium"))],
        otherwise=F.lit("big"),
    )
    assert _eval(spark, col, [5.0, 15.0, 25.0]) == ["small", "medium", "big"]


def test_case_ladder_no_otherwise_yields_null(spark):
    col = case_ladder([(F.col("v") < 10, F.lit("small"))])
    assert _eval(spark, col, [50.0]) == [None]


def test_case_ladder_empty_raises():
    with pytest.raises(ValueError):
        case_ladder([])


def test_risk_prob_band(spark):
    col = risk_prob_band(F.col("v"))
    assert _eval(spark, col, [0.0, 0.249, 0.25, 0.49, 0.5, 0.9]) == [
        "Low",
        "Low",
        "Moderate",
        "Moderate",
        "High",
        "High",
    ]


def test_range_status_with_margins(spark):
    # reference semantics test.py:166-183 with low=10, high=20
    col = range_status_with_margins(F.col("v"), 10.0, 20.0)
    assert _eval(spark, col, [None, 8.9, 9.5, 10.0, 20.0, 23.9, 24.1]) == [
        "Unknown",
        "Low",
        "Borderline low",
        "In range",
        "In range",
        "Borderline high",
        "High",
    ]
