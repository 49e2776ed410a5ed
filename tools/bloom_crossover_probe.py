"""Crossover probe for the bloom-vs-exact decontamination trade (r8
verdict ask #3): at what EVAL-SET size does the fixed-size bitset
broadcast overtake the exact shingle-string broadcast?

The r8 board's one remaining scale claim without a measurement:
`bloom_decontaminate`'s reason to exist is that a many-benchmark eval
suite is GBs of shingle STRINGS at 100 TB corpus scale, while its
bitset is ~1.2 MB per million shingles. At gate scale (sf0.1, eval ≈
25k shingles) the exact path wins — the bloom path pays a bitset
build, a driver collect, and k in-row hashes per corpus shingle for a
broadcast saving that tiny eval sets never repay. This probe holds the
TRAIN side fixed (the sf0.1 corpus' train split) and grows only the
eval side 1x/10x/100x in distinct-shingle count, timing both paths.

Eval growth protocol: each grown eval doc is a copy of a real eval doc
with every token suffixed ``~<replica>`` — so each copy contributes an
entirely fresh, same-shaped set of 3-gram shingles — and an id offset
into untouched id space, kept only when the salted-md5 bucket actually
lands in the eval split (the operators derive the split from the id
hash; we do not fight it, we oversample ~10x and filter). The train
split is byte-identical across multipliers, so the time deltas isolate
eval growth.

Run: python tools/bloom_crossover_probe.py [multipliers ...]  # default 1 10 100
Results recorded in SCALING.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators import decontam as D
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
RUNS = 3
ID_STRIDE = 10_000_019  # prime ≫ max real doc_id: replica ids never collide


def _replicas(side, mult: int, keep_eval: bool):
    """``(mult-1)``x perturbed copies of ``side`` whose ids land back in
    the same split. Bucket keep-rate is EVAL_PCT/100 (eval) or its
    complement (train): oversample by the inverse and keep EVERY
    survivor (no .limit — a global limit collapses to one task). The
    realized count lands binomially near the target; the probe reports
    realized numbers."""
    keep_rate = D.EVAL_PCT if keep_eval else 100 - D.EVAL_PCT
    reps = max(1, (mult - 1) * 100 // keep_rate)
    pred = D.eval_bucket(F.col("doc_id")) < D.EVAL_PCT
    return (
        side.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.lit(reps))).alias("__j"),
        )
        .select(
            (
                F.col("doc_id").cast("long")
                + F.col("__j").cast("long") * F.lit(ID_STRIDE).cast("long")
            ).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda x: F.concat(
                        x, F.lit("~"), F.col("__j").cast("string")
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .filter(pred if keep_eval else ~pred)
    )


def grown_docs(spark, train_mult: int, eval_mult: int):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = D.eval_bucket(F.col("doc_id")) < D.EVAL_PCT
    grown = docs
    n_ev = docs.filter(is_eval).count()
    if eval_mult > 1:
        grown = grown.unionByName(
            _replicas(docs.filter(is_eval), eval_mult, keep_eval=True)
        )
    if train_mult > 1:
        grown = grown.unionByName(
            _replicas(docs.filter(~is_eval), train_mult, keep_eval=False)
        )
    return grown, n_ev * eval_mult


def main(mults: list[int]) -> None:
    spark = get_spark()
    rows = []
    for tm, em in mults:
        docs, n_eval_docs = grown_docs(spark, tm, em)
        # materialize the grown input once so neither path pays the
        # replica construction inside its timed region
        docs = docs.cache()
        docs.count()
        n_eval_shingles = (
            docs.filter(D.eval_bucket(F.col("doc_id")) < D.EVAL_PCT)
            .select(
                F.explode(
                    __import__(
                        "healthcare_aws_data_engineering_spark.operators.dedup",
                        fromlist=["word_shingles"],
                    ).word_shingles(F.col("text"), 3)
                ).alias("s")
            )
            .distinct()
            .count()
        )
        timings = {}
        results = {}
        for name, fn in [
            ("exact", D.decontaminate),
            ("bloom", D.bloom_decontaminate),
        ]:
            ts = []
            for _ in range(RUNS):
                t0 = time.time()
                out = fn(docs).agg(
                    F.count(F.lit(1)), F.sum(F.col("contaminated").cast("int"))
                ).collect()[0]
                ts.append(time.time() - t0)
            timings[name] = round(statistics.median(ts), 2)
            results[name] = (out[0], out[1])
        assert results["exact"] == results["bloom"], (
            "paths diverged!",
            results,
        )
        m, k = D._bloom_geometry(n_eval_shingles)
        rows.append(
            {
                "train_mult": tm,
                "eval_mult": em,
                "eval_docs": n_eval_docs,
                "eval_shingles": n_eval_shingles,
                "bitset_mb": round(m / 8 / 1e6, 2),
                "exact_s": timings["exact"],
                "bloom_s": timings["bloom"],
                "train_rows_flagged": results["exact"][1],
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        docs.unpersist()
    print(json.dumps({"probe": "bloom_crossover", "rows": rows}), flush=True)


if __name__ == "__main__":
    # args: TRAINxEVAL pairs, e.g. "1x1 1x10 1x100 8x100"
    pairs = [
        (int(a.split("x")[0]), int(a.split("x")[1])) for a in sys.argv[1:]
    ] or [(1, 1), (1, 10), (1, 100), (8, 1), (8, 100)]
    main(pairs)
