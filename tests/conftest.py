from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from healthcare_aws_data_engineering_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# Shared plan-inspection helpers (used by test_plan_quality.py and
# test_pipeline_ops.py — keep the exchange-counting heuristic in ONE place).
def plan_string(df, mode: str = "formatted") -> str:
    jexp = df._jdf.queryExecution()
    spark = df.sparkSession
    return jexp.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def n_exchanges(plan: str) -> int:
    """Shuffle exchanges in the op tree (not broadcast, not the per-node
    detail section that repeats each operator name)."""
    import re

    tree = plan.split("\n\n(1)")[0]
    return len(re.findall(r"[+:]- Exchange ", tree))
