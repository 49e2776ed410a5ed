"""Ad-hoc query surface + SQL-vs-DataFrame report parity.

The end-to-end healthcare path: ETL output → registered curated tables →
spark.sql reports == DataFrame-builder reports, row for row.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.plans import adhoc
from healthcare_aws_data_engineering_spark.plans.report_sql import (
    cvd_report_sql,
    prediabetes_report_sql,
)
from healthcare_aws_data_engineering_spark.plans.reports import (
    cvd_report,
    prediabetes_report,
)

ANALYTES = [
    "Cholesterol in HDL [Mass/volume] in Serum or Plasma",
    "Low Density Lipoprotein Cholesterol",
    "Triglycerides",
    "Cholesterol [Mass/volume] in Serum or Plasma",
    "Hemoglobin A1c/Hemoglobin.total in Blood",
    "Glucose [Mass/volume] in Blood",
    "Glucose [Mass/volume] in Urine by Test strip",
    "Glucose [Presence] in Urine by Test strip",
    "Body height",
]
QUAL = ["Positive", "pos", " Trace ", "Negative", "NEG", "n/a", None]


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    """Synthetic curated observation table: 40 patients × random analyte
    readings spanning the band edges, duplicated timestamps for ties."""
    rng = random.Random(7)
    rows = []
    oid = 0
    for p in range(40):
        pid = f"pat-{p:03d}"
        for _ in range(rng.randint(0, 14)):
            oid += 1
            code = rng.choice(ANALYTES)
            qualitative = "Urine" in code and "Presence" in code or "strip" in code
            value = (
                None
                if qualitative and rng.random() < 0.8
                else float(
                    round(
                        rng.choice(
                            [rng.uniform(0, 300),
                             rng.choice([40.0, 59.0, 60.0, 100.0, 126.0, 5.7, 6.5, 70.0])]
                        ),
                        2,
                    )
                )
            )
            ts = f"2023-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}T0{rng.randint(0, 9)}:00:00-00:00"
            rows.append(
                (
                    f"obs-{oid:05d}",
                    "final",
                    "Laboratory",
                    "http://loinc.org",
                    f"c{oid}",
                    code,
                    value,
                    "mg/dL",
                    rng.choice(QUAL) if qualitative else None,
                    ts,
                    pid,
                    f"enc-{p:03d}",
                )
            )
        # guaranteed tie pair on (patient, analyte, ts)
        oid += 2
        rows.append(
            ("obs-%05d" % (oid - 1), "final", "Laboratory", "s", "c", ANALYTES[0],
             45.0, "mg/dL", None, "2023-06-01T00:00:00-00:00", pid, "e")
        )
        rows.append(
            ("obs-%05d" % oid, "final", "Laboratory", "s", "c", ANALYTES[0],
             62.0, "mg/dL", None, "2023-06-01T00:00:00-00:00", pid, "e")
        )
    schema = (
        "observation_id string, status string, category string, "
        "code_system string, code string, code_display string, "
        "value_quantity double, value_unit string, value_string string, "
        "effective_datetime string, patient_id string, encounter_id string"
    )
    df = spark.createDataFrame(rows, schema)
    base = tmp_path_factory.mktemp("curated")
    df.write.mode("overwrite").parquet(str(base / "observation"))
    spark.read.parquet(str(base / "observation")).createOrReplaceTempView("observation")
    return str(base)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_cvd_sql_equals_dataframe(spark, curated):
    via_sql = spark.sql(cvd_report_sql("observation"))
    via_df = cvd_report(spark.table("observation"))
    assert via_sql.columns == via_df.columns
    assert _sorted_rows(via_sql) == _sorted_rows(via_df)


def test_prediabetes_sql_equals_dataframe(spark, curated):
    via_sql = spark.sql(prediabetes_report_sql("observation"))
    via_df = prediabetes_report(spark.table("observation"))
    assert via_sql.columns == via_df.columns
    assert _sorted_rows(via_sql) == _sorted_rows(via_df)


def test_adhoc_threshold_queries(spark, curated):
    hdl = "Cholesterol in HDL [Mass/volume] in Serum or Plasma"
    n = adhoc.threshold_count(spark, hdl, 70).collect()[0]["num_of_values"]
    vals = [r.value_quantity for r in adhoc.threshold_values(spark, hdl, 70).collect()]
    assert n == len(vals) > 0
    assert all(v < 70 for v in vals)


def test_adhoc_range_scan_sorted(spark, curated):
    out = [
        r.effective_datetime
        for r in adhoc.observations_in_range(
            spark, "observation", "2023-03-01T00:00:00-00:00", "2023-09-01T00:00:00-00:00"
        ).collect()
    ]
    assert out == sorted(out)
    assert all("2023-03" <= t <= "2023-09" for t in out)


def test_predicates_reach_parquet_scan(spark, curated):
    """P6-style predicates must be PushedFilters on the parquet scan, and
    the projection must prune to the 2 referenced columns (ReadSchema)."""
    hdl = "Cholesterol in HDL [Mass/volume] in Serum or Plasma"
    plan = (
        adhoc.threshold_values(spark, hdl, 70)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(code_display), IsNotNull(value_quantity)" in plan
    assert "ReadSchema: struct<code_display:string,value_quantity:double>" in plan


def test_catalog_registration(spark, curated, tmp_path):
    adhoc.register_curated_tables(spark, curated, database="hc_test")
    # only observation has data in this fixture; the others resolve empty
    assert spark.table("hc_test.observation").count() > 0
    got = {r.tableName for r in spark.sql("SHOW TABLES IN hc_test").collect()}
    assert got >= {"patient", "observation", "condition", "encounter"}
    assert "class_code" in spark.table("hc_test.encounter").columns
    spark.sql("DROP DATABASE hc_test CASCADE")
