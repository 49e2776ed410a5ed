"""Driver-facing ML queries (SURVEY §2.10 M1–M7) over the testdata.

- ``ml_features``   — M7 feature table (oracle-checked).
- ``ml_preprocess`` — M1–M4 impute→scale→PCA→cluster. The oracle SQL is
  GENERATED from the same extracted parameters with identical expression
  association order, so per-row doubles match bit-for-bit (no aggregation
  is involved — only per-row affine math).
- ``ml_risk_scores``— M5/M6 XGBoost probabilities + flags + bands. 400-tree
  boosters are not SQL-expressible → driver records the rows-only check;
  numeric parity is covered by pytest (vectorized UDF vs scalar traversal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ml import inference as I
from ..ml.features import feature_table, feature_table_sql
from ..ml.params import sklearn_pipeline
from ..sources.tables import load_table


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return feature_table(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


def q_ml_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _features(spark, sf_dir)


def q_ml_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return I.preprocess(_features(spark, sf_dir))


def q_ml_risk_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return I.predict_diseases(_features(spark, sf_dir))


def _preprocess_sql() -> str:
    n_comp = len(sklearn_pipeline()["pca"]["components"])
    znames = [f"z{j}" for j in range(n_comp)]
    zsel = ",\n  ".join(
        f"{expr} AS {z}" for z, expr in zip(znames, I.pca_sql_exprs())
    )
    return f"""
WITH features AS ({feature_table_sql()}),
z AS (
  SELECT patient_id,
  {zsel}
  FROM features
)
SELECT patient_id, {', '.join(znames)},
  {I.kmeans_sql_expr(znames)} AS cluster
FROM z
"""


ML_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ml_features": q_ml_features,
    "ml_preprocess": q_ml_preprocess,
    "ml_risk_scores": q_ml_risk_scores,
}


def ml_oracle() -> dict[str, str]:
    return {
        "ml_features": feature_table_sql(),
        "ml_preprocess": _preprocess_sql(),
        # ml_risk_scores: no SQL oracle (400-tree boosters) → rows-only.
    }


ML_ORACLE: dict[str, str] = ml_oracle()
