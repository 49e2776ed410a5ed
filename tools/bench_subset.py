"""Bench a subset of queries with EXACTLY bench.py's methodology
(warm-up run, then median of 3 timed collects, clearCache after the
query) — for before/after A/B during optimization without paying for
the whole 150-query suite.

Usage: python tools/bench_subset.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aws_data_engineering_spark.plans.testdata_queries import QUERIES
from healthcare_aws_data_engineering_spark.session import get_spark

RUNS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    first_fn = QUERIES[names[0]]
    for _ in range(3):
        first_fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    total = 0.0
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        total += med
        print(f"{name:28} {med:8.3f}   (runs: {' '.join(f'{s:.3f}' for s in samples)})")
        spark.catalog.clearCache()
    print(f"{'TOTAL':28} {total:8.3f}")


if __name__ == "__main__":
    main()
