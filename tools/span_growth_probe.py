"""Growth probe for the r7 span operators (scale_probe protocol).

Replicates the sf0.1 documents ×M with disjoint id spaces and times
``repeated_spans`` and ``scrub_repeated``. Replicas DUPLICATE text, so
every window of every replicated doc becomes corpus-repeated — the
worst-case marking density for both operators (every position marked,
maximal island sizes, scrub cuts everything outside replica #1) — which
makes this an upper-bound probe, not a typical-case one.

Run: python tools/span_growth_probe.py [multipliers ...]   # default 1 2 4
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from healthcare_aws_data_engineering_spark.operators.spans import (
    repeated_spans,
    scrub_repeated,
)
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

sys.path.insert(0, "tools")
from scale_probe import replicate  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def timed_collect(fn):
    """count() would let Catalyst prune the kept_fp md5 / HOF-filter
    columns — collect the full rows so the probe times the real work."""
    t0 = time.perf_counter()
    rows = len(fn().collect())
    return round(time.perf_counter() - t0, 2), rows


def main() -> None:
    ms = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("span-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    # JVM/codegen warmup outside the timed region
    repeated_spans(docs0).collect()
    scrub_repeated(docs0).collect()
    results: dict[str, dict[int, float]] = {}
    for m in ms:
        docs = replicate(docs0, "doc_id", m).persist()
        docs.count()
        for name, fn in (
            ("repeated_spans", lambda: repeated_spans(docs)),
            ("span_scrub", lambda: scrub_repeated(docs)),
        ):
            sec, rows = timed_collect(fn)
            results.setdefault(name, {})[m] = sec
            print(
                json.dumps({"op": name, "m": m, "sec": sec, "rows": rows}),
                flush=True,
            )
        docs.unpersist()
    for name, by_m in results.items():
        ratios = [
            round(by_m[b] / by_m[a], 2)
            for a, b in zip(ms, ms[1:])
            if by_m[a] > 0
        ]
        print(json.dumps({"op": name, "sec_by_m": by_m, "per_doubling": ratios}))


if __name__ == "__main__":
    main()
