"""Mega-domain probe for ``domain_cap_topk`` (r6 verdict optional #7).

The r6 growth probes ran on the gate corpus, whose sources are BALANCED
— they never exercised the hot-domain shape the salted top-k exists
for. This probe synthesizes the adversarial distribution directly: ONE
source ("megadomain") holds ~50% of all rows, the rest spread over 1000
sources, with deterministic hash-derived qualities (so the probe times
the top-k machinery, not text_stats — same discipline as
prefix_sum_probe).

Checks, per row-count n (default 2M 4M 8M):
  * stage-1 group bound: max (source, salt) group ≈ n/2/salts — the
    claim that no task ever sorts the whole mega-domain;
  * wall time for salts=32 vs the exact single-window form (salts=1 is
    exactly that shape: one partition holds the whole mega-domain);
  * at the smallest n, keep-set equality of the two forms (the
    correctness pin, re-stated on the hot distribution).

Run: python tools/megadomain_probe.py [n ...]   # default 2M 4M 8M
Prints one JSON line per measurement; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F

from healthcare_aws_data_engineering_spark.plans.training_data_queries import (
    DOMAIN_CAP,
    domain_cap_topk,
)
from healthcare_aws_data_engineering_spark.session import get_spark

QUALITY_GRID = 1_000_000


def hot_stats(spark, n: int) -> DataFrame:
    """Synthetic (doc_id, source, quality): ~50% of rows in ONE source."""
    h = F.abs(F.xxhash64(F.col("id"), F.lit("megadomain#")))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(h % 2 == 0, F.lit("megadomain"))
        .otherwise(F.concat(F.lit("src_"), (h % 1000).cast("string")))
        .alias("source"),
        ((h % QUALITY_GRID) / QUALITY_GRID).alias("quality"),
    )


def exact_keep(stats: DataFrame, cap: int = DOMAIN_CAP) -> DataFrame:
    """The exact per-source window (the q_domain_cap shape, kept rows)."""
    from pyspark.sql import Window as _W

    w = _W.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        stats.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "source", "quality", "rk")
    )


def timed(fn):
    t0 = time.perf_counter()
    rows = fn().count()
    return round(time.perf_counter() - t0, 2), rows


def main() -> None:
    ns = [int(float(x)) for x in sys.argv[1:]] or [2_000_000, 4_000_000, 8_000_000]
    spark = get_spark("megadomain-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # correctness pin on the hot distribution (smallest n, both salt ends)
    small = hot_stats(spark, 200_000).persist()
    small.count()
    exact = {(r.doc_id, r.rk) for r in exact_keep(small).collect()}
    for salts in (1, 4, 32):
        got = {
            (r.doc_id, r.rk) for r in domain_cap_topk(small, salts=salts).collect()
        }
        assert got == exact, f"salts={salts} diverged on the hot distribution"
    small.unpersist()
    print(json.dumps({"check": "keep-set equality at n=200k, salts 1/4/32", "ok": True}), flush=True)

    summary = {}
    for n in ns:
        stats = hot_stats(spark, n).persist()
        stats.count()
        # stage-1 bound: max (source, salt) group for salts=32
        g = (
            stats.withColumn(
                "__salt", F.pmod(F.xxhash64("doc_id"), F.lit(32)).cast("int")
            )
            .groupBy("source", "__salt")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        mega = n // 2
        for salts in (1, 32):
            sec, rows = timed(lambda: domain_cap_topk(stats, salts=salts))
            summary.setdefault(n, {})[salts] = sec
            print(
                json.dumps(
                    {
                        "n": n,
                        "salts": salts,
                        "sec": sec,
                        "kept_rows": rows,
                        "max_stage1_group": g,
                        "mega_rows": mega,
                        "group_frac_of_mega": round(g / mega, 4),
                    }
                ),
                flush=True,
            )
        stats.unpersist()
    print(json.dumps({"summary_sec": summary}), flush=True)


if __name__ == "__main__":
    main()
