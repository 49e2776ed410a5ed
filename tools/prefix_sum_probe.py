"""Empirical probe: two-phase bucketed global prefix sum vs the naive
single-partition window (`SUM() OVER (ORDER BY ...)` with no PARTITION
BY) that `q_token_budget_fill` deliberately avoids.

The naive form is the canonical Spark scale trap: the whole corpus is
sorted into ONE task, so wall time grows linearly in rows on a single
core no matter how many executors exist. The two-phase form (coarse
monotone key buckets -> <=B-row prefix table broadcast back -> window
partitioned by bucket) keeps every partition at ~n/B rows and scales
with the cluster. Run:

    python tools/prefix_sum_probe.py [row_counts ...]   # default 2e6 8e6 32e6

Prints one JSON line per (variant, n) with wall seconds and a checksum
(sum of cum over a fixed id sample) proving both variants computed the
SAME prefix sums. Results are recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window, functions as F

from healthcare_aws_data_engineering_spark.session import get_spark

N_BUCKETS = 256


def synth(spark, n: int):
    """Deterministic (id, quality, n_tokens): quality = hash-derived
    uniform double in [0,1), n_tokens in [1,512]. Same distribution the
    documents table induces, without the text_stats regex cost, so the
    probe times the WINDOW, not the feature extraction."""
    return spark.range(n).select(
        F.col("id"),
        ((F.xxhash64("id") % 1_000_000 + 1_000_000) % 1_000_000
         / 1_000_000.0).alias("quality"),
        ((F.xxhash64("id", F.lit(1)) % 512 + 512) % 512 + 1)
        .cast("int")
        .alias("n_tokens"),
    )


def naive(df):
    w = Window.orderBy(F.col("quality").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.select("id", F.sum("n_tokens").over(w).alias("cum"))


def bucketed(df):
    staged = df.withColumn(
        "__b",
        F.least(
            F.floor(F.col("quality") * N_BUCKETS), F.lit(N_BUCKETS - 1)
        ).cast("int"),
    )
    per_bucket = staged.groupBy("__b").agg(F.sum("n_tokens").alias("__bt"))
    w_all = Window.orderBy(F.col("__b").desc())
    prefixed = per_bucket.select(
        "__b",
        F.coalesce(
            F.sum("__bt").over(
                w_all.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__prefix"),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col("quality").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return staged.join(F.broadcast(prefixed), "__b").select(
        "id", (F.col("__prefix") + F.sum("n_tokens").over(w_in)).alias("cum"),
    )


def checksum(df):
    """Sum of cum over ids divisible by 10007 — a sparse deterministic
    sample; equal checksums mean equal prefix sums with overwhelming
    probability."""
    return (
        df.filter(F.col("id") % 10007 == 0)
        .agg(F.sum("cum").alias("s"))
        .collect()[0]["s"]
    )


def main() -> int:
    ns = [int(float(a)) for a in sys.argv[1:]] or [2_000_000, 8_000_000, 32_000_000]
    spark = get_spark("prefix-sum-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        df = synth(spark, n)
        row = {"n": n}
        for name, fn in [("naive_global_window", naive), ("two_phase_bucketed", bucketed)]:
            out = fn(df)
            out.count()  # warm: file-less, but JIT/codegen
            t0 = time.perf_counter()
            cs = checksum(out)
            row[name + "_sec"] = round(time.perf_counter() - t0, 2)
            row[name + "_checksum"] = cs
        row["equal"] = (
            row["naive_global_window_checksum"]
            == row["two_phase_bucketed_checksum"]
        )
        row["speedup"] = round(
            row["naive_global_window_sec"]
            / max(row["two_phase_bucketed_sec"], 1e-9),
            2,
        )
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
