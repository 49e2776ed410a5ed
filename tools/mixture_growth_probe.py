"""Growth probe for mixture_draw (r8 verdict ask #6): is the draw's
cost linear in its OUTPUT (the epoch budget), not corpus x upsample
factor?

The claim is structural — output rows ≈ Σ_s target_s = epoch_docs
regardless of how the per-source explode factors land — but every
other new operator got the x1/x2/x4 treatment, so measure it: corpus
replicated x1/x2/x4 (scale_probe protocol, disjoint id spaces), and
epoch_docs set to 8x and 32x the corpus size (so every doc fans out
~8/~32 full epochs plus a partial). Both the default hash-threshold
path and exact=True are timed.

Expected shape if the claim holds: at fixed corpus, 32x epochs cost
~4x the 8x epochs (output-linear); at fixed fan-out, x4 corpus costs
~4x (input- AND output-linear — both quadruple). A superlinear row
would mean the explode or the boundary-bucket machinery scales with
corpus x factor instead.

Run: python tools/mixture_growth_probe.py  # multipliers 1 2 4, fan-outs 8 32
Results recorded in SCALING.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from healthcare_aws_data_engineering_spark.plans import corpus_queries as cq
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table
from scale_probe import replicate

SF_DIR = "/root/testdata/sf0.1"
RUNS = 3


def main() -> None:
    spark = get_spark()
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    rows = []
    for m in (1, 2, 4):
        docs = replicate(base, "doc_id", m).cache()
        n_docs = docs.count()
        for fan in (8, 32):
            epoch_docs = n_docs * fan
            for exact in (False, True):
                ts, n_out = [], 0
                for _ in range(RUNS):
                    t0 = time.time()
                    n_out = cq.mixture_draw(
                        docs, epoch_docs, exact=exact
                    ).count()
                    ts.append(time.time() - t0)
                rows.append(
                    {
                        "corpus_mult": m,
                        "n_docs": n_docs,
                        "fan_out": fan,
                        "exact": exact,
                        "out_rows": n_out,
                        "sec": round(statistics.median(ts), 2),
                    }
                )
                print(json.dumps(rows[-1]), flush=True)
        docs.unpersist()
    print(json.dumps({"probe": "mixture_growth", "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
