"""Capture .explain("formatted") for named queries into plan files.

Usage: python tools/capture_plans.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query — the round's
before/after plan evidence (run once from the pre-round tree via a git
worktree for `before`, once from the working tree for `after`).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from healthcare_aws_data_engineering_spark.session import get_spark  # noqa: E402
from __spark_entry__ import queries  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)


if __name__ == "__main__":
    main()
