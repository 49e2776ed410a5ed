"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CVD-report query on sf0.001 (smoke check).
``queries()``   — one callable per implemented SURVEY.md §2 operator.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (correctness gate).

Implementations live in
``healthcare_aws_data_engineering_spark/plans/testdata_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_aws_data_engineering_spark.plans import testdata_queries as tq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tq.q_report_cvd(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(tq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(tq.ORACLE)
