"""Growth probe for the TPC-H hard shapes (r12: Q13/Q2/Q20/Q11/Q5/Q16/
Q8; r13 adds Q9): does wall-clock track the INPUT linearly while the
plan shape stays fixed?

The queries share the scale story their plan tests pin — Q13 never
moves an order row past its first aggregation; Q2/Q20/Q11/Q16 ride ONE
lineitem scan into the derived-partsupp pair aggregation and keep every
later stage bounded by |pairs|, |parts| or |suppliers|; Q5/Q8/Q9 keep
one lineitem fact pass with dims broadcast (Q9's partsupp leg is a pure
projection of the pair key) — so the expected probe shape is: ×10 input
≈ ≤×10 wall (sublinear at these SFs where fixed plan/driver overhead
dominates), with NO superlinear jump between sf0.01 and sf0.1 (the jump
a hidden all-pairs or funnel stage would produce).

Inputs default to the driver's own testdata snapshots (sf0.001/0.01/0.1
— lineitem 6k/60k/600k rows, a 100x spread); median of RUNS after
suite-level warm-up (BASELINE.md r5 position-effect protocol).

Run: python tools/warehouse_shapes_probe.py [sf_dir ...]
(r12 advice: sf_dir arguments override the default list, matching
tools/check_correctness.py's convention.)
Results recorded in SCALING.md (r12/r13 sections).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from healthcare_aws_data_engineering_spark.plans import (  # noqa: E402
    warehouse_queries as w,
)
from healthcare_aws_data_engineering_spark.session import get_spark  # noqa: E402

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
QUERIES = [
    "order_count_distribution",
    "min_cost_supplier",
    "excess_suppliers",
    "part_value_share",
    "local_supplier_volume",
    "supplier_part_counts",
    "market_share",
    "product_profit",
]
RUNS = 3


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    spark = get_spark()
    for sf_dir in sf_dirs:
        # suite-level warm-up: every query once before any timing
        for name in QUERIES:
            w.WAREHOUSE_QUERIES[name](spark, sf_dir).collect()
        for name in QUERIES:
            fn = w.WAREHOUSE_QUERIES[name]
            samples = []
            n_out = 0
            for _ in range(RUNS):
                t0 = time.perf_counter()
                n_out = len(fn(spark, sf_dir).collect())
                samples.append(time.perf_counter() - t0)
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf_dir": sf_dir.rsplit("/", 1)[-1],
                        "sec": round(statistics.median(samples), 2),
                        "rows": n_out,
                    }
                ),
                flush=True,
            )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
