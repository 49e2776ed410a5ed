"""Dump the physical plan of every driver query — the plan-review loop.

Usage: python tools/explain_all.py [sf_dir] [query ...]

Prints the op tree (formatted mode, without the per-node detail section)
plus scan-level pushdown info for each query, so plan regressions are easy
to eyeball; the enforced invariants live in tests/test_plan_quality.py.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from healthcare_aws_data_engineering_spark.session import get_spark
from __spark_entry__ import queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("explain-all")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        tree = plan.split("\n\n(1)")[0]
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        print(tree.replace("== Physical Plan ==\n", "").rstrip())
        for m in re.finditer(r"(PushedFilters|PartitionFilters): \[[^\]]*\]", plan):
            print(f"  {m.group(0)}")
        n_shuffle = len(re.findall(r"[+:]- Exchange ", tree))
        n_bcast = tree.count("BroadcastExchange")
        print(f"  [shuffles={n_shuffle} broadcasts={n_bcast}]")


if __name__ == "__main__":
    main()
