"""Scoring-layer parity: golden values hand-derived from the reference
demo dataset (mrp_website.py:259-279) and numpy cross-checks for the
forecast math."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.plans.wellness import (
    disease_confidence,
    forecast,
    latest_snapshot,
    monthly_wellness,
    score_rows,
    top_penalty_drivers,
    trend_arrow,
)

# The reference app's demo series (mrp_website.py:259-279), fixed dates.
DEMO_COLS = [
    "LDL", "HDL", "Triglycerides", "TotalChol", "A1c", "GlucoseBlood",
    "eGFR", "Creatinine", "BUN", "Hemoglobin", "Hematocrit", "ALT", "AST",
    "Bilirubin", "Albumin",
]
DEMO = {
    "LDL": [168, 160, 155, 150, 145, 140, 135],
    "HDL": [38, 39, 40, 42, 44, 46, 48],
    "Triglycerides": [210, 205, 195, 185, 175, 165, 150],
    "TotalChol": [245, 240, 232, 225, 215, 205, 198],
    "A1c": [6.1, 6.0, 5.9, 5.8, 5.8, 5.7, 5.7],
    "GlucoseBlood": [118, 114, 110, 108, 104, 100, 98],
    "eGFR": [72, 74, 76, 78, 82, 86, 90],
    "Creatinine": [1.2, 1.18, 1.15, 1.1, 1.05, 1.02, 1.0],
    "BUN": [22, 21, 20, 19, 18, 17, 16],
    "Hemoglobin": [11.6, 11.8, 12.0, 12.3, 12.4, 12.5, 12.7],
    "Hematocrit": [35.5, 36.0, 36.5, 37.0, 38.0, 39.0, 40.0],
    "ALT": [52, 48, 44, 40, 38, 36, 34],
    "AST": [41, 40, 39, 37, 36, 35, 34],
    "Bilirubin": [1.3, 1.2, 1.1, 1.1, 1.0, 0.9, 0.9],
    "Albumin": [3.4, 3.5, 3.6, 3.7, 3.8, 3.9, 4.0],
}
DATES = [dt.datetime(2024, m, 15) for m in range(1, 8)]


@pytest.fixture(scope="module")
def labs(spark):
    rows = [
        tuple([DATES[i], "P001"] + [float(DEMO[c][i]) for c in DEMO_COLS])
        for i in range(7)
    ]
    schema = "date timestamp, patient_id string, " + ", ".join(
        f"{c} double" for c in DEMO_COLS
    )
    return spark.createDataFrame(rows, schema)


def test_latest_snapshot_golden(spark, labs):
    row = latest_snapshot(labs).collect()[0].asDict()
    # hand-derived from REFS bins + weights on the last demo row
    assert row["subscore_cardiovascular"] == pytest.approx(60.0)
    assert row["subscore_prediabetes"] == pytest.approx(60.0)
    assert row["subscore_ckd"] == pytest.approx(100.0)
    assert row["subscore_anemia"] == pytest.approx(100.0)
    assert row["subscore_liver"] == pytest.approx(100.0)
    assert row["wellness"] == pytest.approx(80.0)
    assert row["wellness_confidence"] == pytest.approx(1.0)
    assert row["wellness_areas_used"] == 5
    assert row["patterns"] == []
    assert row["label_cardiovascular"] == "Likely normal"
    assert row["label_prediabetes"] == "Prediabetes / Elevated risk"
    assert row["chip_prediabetes"] == "Watch"
    assert row["chip_cardiovascular"] == "Normal"
    assert row["label_liver"] == "No liver dysfunction signal"


def test_first_row_golden(spark, labs):
    first = score_rows(labs.filter(F.col("date") == DATES[0])).collect()[0].asDict()
    assert first["subscore_cardiovascular"] == pytest.approx(0.0)
    assert first["subscore_prediabetes"] == pytest.approx(100 - 2 * 100 / 3)
    assert first["subscore_ckd"] == pytest.approx(75.0)
    assert first["subscore_anemia"] == pytest.approx(100 - 2 * 100 / 3)
    assert first["subscore_liver"] == pytest.approx(100 - 2 * 100 / 3)
    assert first["wellness"] == pytest.approx(
        0 * 0.25 + (100 - 200 / 3) * 0.25 + 75 * 0.2 + (100 - 200 / 3) * 0.3
    )
    assert set(first["patterns"]) == {
        "high_ldl_low_hdl",
        "elevated_a1c_glucose",
        "low_hemoglobin",
    }
    assert first["label_cardiovascular"] == "At risk"
    assert first["label_anemia"] == "Anemia likely"
    assert first["label_liver"] == "Liver dysfunction likely (multiple abnormalities)"
    assert first["label_ckd"] == "Likely normal"
    assert first["penalty_cardiovascular_ldl"] == 3
    assert first["penalty_cardiovascular_hdl"] == 3


def test_missing_analytes_renormalize(spark):
    """Subscore NULL when nothing present; wellness renormalizes by the
    present weight mass (mrp_website.py:199-204, 218-224)."""
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "p", 168.0)],
        "date timestamp, patient_id string, LDL double",
    )
    row = score_rows(df).collect()[0].asDict()
    assert row["subscore_cardiovascular"] == pytest.approx(100 - 3 * 0.4 * 100 / 3)
    assert row["subscore_prediabetes"] is None
    assert row["subscore_ckd"] is None
    # only Cardiovascular present → wellness = its subscore, confidence 0.25
    assert row["wellness"] == pytest.approx(row["subscore_cardiovascular"])
    assert row["wellness_confidence"] == pytest.approx(0.25)
    assert row["label_prediabetes"] == "Insufficient data"
    assert row["chip_prediabetes"] == "Watch"
    # patterns need both columns present → none fire
    assert row["patterns"] == []


def test_monthly_wellness_series(spark, labs):
    out = monthly_wellness(labs).orderBy("month").collect()
    assert len(out) == 7  # one per calendar month
    series = [r["wellness"] for r in out]
    assert series[0] == pytest.approx(100 / 3)
    assert series[-1] == pytest.approx(80.0)
    assert series == sorted(series)  # demo data improves monotonically


def test_disease_confidence(spark, labs):
    row = disease_confidence(labs).collect()[0].asDict()
    for d in ("cardiovascular", "prediabetes", "ckd", "anemia", "liver"):
        assert row[f"confidence_{d}"] == "High"
    sparse = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "p", 100.0)],
        "date timestamp, patient_id string, A1c double",
    )
    srow = disease_confidence(sparse).collect()[0].asDict()
    assert srow["confidence_prediabetes"] == "Medium"
    assert srow["confidence_cardiovascular"] == "Low"


def test_trend_arrow_directions(spark, labs):
    cardio = trend_arrow(labs, "Cardiovascular").collect()[0]
    assert cardio["trend"] == "improving"  # LDL falling
    anemia = trend_arrow(labs, "Anemia").collect()[0]
    assert anemia["trend"] == "improving"  # Hemoglobin rising
    assert cardio["slope"] == pytest.approx((135 - 168) / 6)


def test_forecast_matches_numpy(spark, labs):
    """Spark closed-form fit + CI must match the reference math
    (np.polyfit + residual std + widening CI, mrp_website.py:671-686)."""
    out = forecast(labs, "A1c").orderBy("month_ahead").collect()
    assert len(out) == 12
    x = np.array([(d - dt.datetime(1970, 1, 1)).days for d in DATES], dtype=float)
    y = np.array(DEMO["A1c"], dtype=float)
    m, b = np.polyfit(x, y, 1)
    sigma = np.std(y - (m * x + b))
    baseline = max(1.0, np.mean(np.abs(y)))
    for k, r in enumerate(out, start=1):
        fd = r["future_month"]
        assert fd.day == 1  # first of month after last observation
        xf = (dt.date(fd.year, fd.month, fd.day) - dt.date(1970, 1, 1)).days
        want = m * xf + b
        ci = sigma + (k / 12) * 0.15 * baseline
        assert r["yhat"] == pytest.approx(want, abs=1e-9)
        assert r["upper"] == pytest.approx(want + ci, abs=1e-6)
        assert r["lower"] == pytest.approx(want - ci, abs=1e-6)
    assert out[0]["future_month"] == dt.date(2024, 8, 1)


def test_forecast_requires_three_points(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "p", 5.0),
            (dt.datetime(2024, 2, 1), "p", 6.0),
        ],
        "date timestamp, patient_id string, A1c double",
    )
    assert forecast(df, "A1c").count() == 0


def test_top_penalty_drivers(spark, labs):
    top = top_penalty_drivers(labs, "Cardiovascular", k=3).collect()
    assert [(r["analyte"], r["penalty"]) for r in top] == [
        ("LDL", 2),
        ("Triglycerides", 2),
        ("HDL", 0),
    ]


def test_score_rows_is_pure_projection(spark, labs):
    """The whole scoring layer must stay shuffle-free (one projection)."""
    plan = score_rows(labs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
