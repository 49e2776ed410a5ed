"""Report-query semantics on synthetic observation rows hitting every CASE
band edge and null leg (FIXTURES.md §2 value domains)."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.plans.reports import (
    cvd_report,
    prediabetes_report,
)

OBS_SCHEMA = (
    "observation_id string, patient_id string, code_display string, "
    "value_quantity double, value_string string, effective_datetime string"
)

HDL = "Cholesterol in HDL [Mass/volume] in Serum or Plasma"
LDL = "Low Density Lipoprotein Cholesterol"
TRIG = "Triglycerides"
TC = "Cholesterol [Mass/volume] in Serum or Plasma"
A1C = "Hemoglobin A1c/Hemoglobin.total in Blood"
GLU = "Glucose [Mass/volume] in Blood"
URINE_Q = "Glucose [Presence] in Urine by Test strip"
URINE_M = "Glucose [Mass/volume] in Urine by Test strip"


def _row(oid, pid, code, vq=None, vs=None, ts="2024-01-01T00:00:00"):
    return (oid, pid, code, vq, vs, ts)


def _by_patient(df):
    return {r["patient"]: r.asDict() for r in df.collect()}


def test_cvd_banding_and_overall(spark):
    rows = [
        # p1: protective HDL, optimal LDL, normal trig, desirable TC
        _row("1", "p1", HDL, 60.0),
        _row("2", "p1", LDL, 99.9),
        _row("3", "p1", TRIG, 149.9),
        _row("4", "p1", TC, 199.9),
        # p2: at risk via low HDL only
        _row("5", "p2", HDL, 39.9),
        # p3: no qualifying analytes at all → absent from output (IN-filter)
        _row("6", "p3", "Body height", 180.0),
        # p4: borderline everything
        _row("7", "p4", HDL, 59.0),
        _row("8", "p4", LDL, 130.0),
        _row("9", "p4", TRIG, 150.0),
        _row("10", "p4", TC, 200.0),
    ]
    df = spark.createDataFrame(rows, OBS_SCHEMA)
    out = _by_patient(cvd_report(df))
    assert set(out) == {"p1", "p2", "p4"}
    p1 = out["p1"]
    assert p1["hdl_status"] == "Protective"
    assert p1["ldl_status"] == "Optimal"
    assert p1["triglycerides_status"] == "Normal"
    assert p1["total_chol_status"] == "Desirable"
    assert p1["overall_cvd_risk"] == "Likely normal"
    p2 = out["p2"]
    assert p2["hdl_status"] == "Low"
    assert p2["ldl_status"] == "n/a"
    assert p2["overall_cvd_risk"] == "At risk"
    p4 = out["p4"]
    assert p4["hdl_status"] == "Normal"
    assert p4["ldl_status"] == "Borderline"
    assert p4["triglycerides_status"] == "Borderline"
    assert p4["total_chol_status"] == "Borderline"
    assert p4["overall_cvd_risk"] == "At risk"


def test_cvd_case_gap_preserved(spark):
    """hdl = 59.5 falls through every reference CASE leg → NULL status
    (deliberately ported gap, not fixed; SURVEY §7.4.3)."""
    df = spark.createDataFrame([_row("1", "p1", HDL, 59.5)], OBS_SCHEMA)
    row = cvd_report(df).collect()[0]
    assert row["hdl_status"] is None
    assert row["overall_cvd_risk"] == "Likely normal"


def test_cvd_latest_wins_with_tiebreak(spark):
    rows = [
        _row("1", "p1", HDL, 10.0, ts="2024-01-01T00:00:00"),
        _row("2", "p1", HDL, 65.0, ts="2024-02-01T00:00:00"),
        # tie on timestamp with row 2 → larger observation_id wins
        _row("3", "p1", HDL, 45.0, ts="2024-02-01T00:00:00"),
    ]
    df = spark.createDataFrame(rows, OBS_SCHEMA)
    row = cvd_report(df).collect()[0]
    assert row["hdl"] == 45.0
    assert row["hdl_status"] == "Normal"


def test_prediabetes_bands_and_urine_text(spark):
    rows = [
        # p1: diabetes by a1c, urine positive (mixed case + whitespace)
        _row("1", "p1", A1C, 6.5),
        _row("2", "p1", URINE_Q, vs="  POSITIVE "),
        # p2: prediabetes band by glucose
        _row("3", "p2", GLU, 100.0),
        # p3: urine MAX over the two strip analytes' latest values:
        # lexicographic max of {'negative', 'trace'} = 'trace'
        _row("4", "p3", URINE_Q, vs="Negative"),
        _row("5", "p3", URINE_M, vs="Trace"),
        # p4: glucose low band
        _row("6", "p4", GLU, 69.9),
    ]
    df = spark.createDataFrame(rows, OBS_SCHEMA)
    out = _by_patient(prediabetes_report(df))
    p1 = out["p1"]
    assert p1["a1c_status"] == "Diabetes"
    assert p1["glucose_urine_status"] == "Abnormal"
    assert p1["overall_t2d_risk"] == "Diabetes likely (lab criteria met)"
    p2 = out["p2"]
    assert p2["glucose_blood_status"] == "Prediabetes"
    assert p2["overall_t2d_risk"] == "Prediabetes / Elevated risk"
    p3 = out["p3"]
    assert p3["glucose_urine_txt"] == "trace"
    assert p3["glucose_urine_status"] == "Borderline"
    assert p3["overall_t2d_risk"] == "Prediabetes / Elevated risk"
    p4 = out["p4"]
    assert p4["glucose_blood_status"] == "Low"
    assert p4["overall_t2d_risk"] == "Normal"


def test_prediabetes_insufficient_data(spark):
    """A patient with only a non-castable qualitative numeric row still
    pivots to all-NULL → 'Insufficient data'."""
    rows = [_row("1", "p1", A1C, None, vs="n/a")]
    df = spark.createDataFrame(rows, OBS_SCHEMA)
    row = prediabetes_report(df).collect()[0]
    assert row["a1c"] is None
    assert row["overall_t2d_risk"] == "Insufficient data"


def test_single_shuffle_plan(spark):
    """The report collapses window+pivot into ONE hash aggregate: the
    physical plan must contain no window exec and only one shuffle."""
    rows = [_row("1", "p1", HDL, 50.0)]
    df = spark.createDataFrame(rows, OBS_SCHEMA)
    plan = cvd_report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
