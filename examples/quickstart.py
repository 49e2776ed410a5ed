"""Quickstart: the engine as a library, no driver contract required.

Reads the synthetic testdata parquet, then runs the three flagship
production paths end-to-end:

1. the cardiovascular-risk report (latest-per-key pivot + CASE banding —
   the reference's Athena report, Athena_queries_for_reports.sql:3-76);
2. monthly wellness scoring (penalty binning → weighted subscores →
   wellness + trend inputs — mrp_website.py's scoring stack);
3. ML disease risk scores on the PRODUCTION fast path (impute → scale →
   PCA → KMeans → 3 fused XGBoost boosters; ``parity=False`` skips the
   cross-engine decimal grid that only the correctness oracle needs).

Run from the repo root:

    python examples/quickstart.py [sf_dir]     # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from healthcare_aws_data_engineering_spark.ml.features import feature_table
from healthcare_aws_data_engineering_spark.ml.inference import predict_diseases
from healthcare_aws_data_engineering_spark.plans.reports import cvd_report
from healthcare_aws_data_engineering_spark.plans.testdata_queries import (
    EVENTS_CVD_KEYS,
    _monthly_labs,
    _obs,
)
from healthcare_aws_data_engineering_spark.plans.wellness import score_rows
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. CVD report: observations view -> latest-per-(patient, analyte)
    #    pivot -> clinical CASE bands.
    report = cvd_report(_obs(spark, sf_dir), keys=EVENTS_CVD_KEYS)
    print("\n== cardiovascular risk report (first 5 patients) ==")
    report.orderBy("patient").show(5, truncate=False)

    # 2. Monthly wellness: last lab value per (patient, month, analyte)
    #    -> penalty bins -> weighted disease subscores -> wellness score.
    labs = _monthly_labs(spark, sf_dir)
    wellness = score_rows(labs.withColumn("date", F.col("month").cast("timestamp")))
    print("== monthly wellness (first 5 rows) ==")
    wellness.select(
        "patient_id", "month", "wellness", "label_cardiovascular"
    ).orderBy("patient_id", "month").show(5, truncate=False)

    # 3. ML risk scores, production fast path (no oracle decimal grid).
    features = feature_table(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )
    scores = predict_diseases(features, parity=False)
    print("== XGBoost disease risk (first 5 patients) ==")
    scores.select(
        "patient_id", "cluster", "prob_cvd", "risk_cvd", "prob_ckd", "risk_ckd"
    ).orderBy("patient_id").show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
