"""Incremental ANN index maintenance — the "vectors keep arriving,
queries never stop" story end-to-end. Every step is an independently
tested library operator (operators/similarity.py,
streaming/ann_index.py).

The problem shape: an IVF-PQ serving index over a growing embedding
corpus. Rebuilding from scratch per snapshot re-reads every vector ever
ingested; appending naively against retrained quantizers corrupts the
cell geometry (old rows coded against old centroids). The resolution is
the one production systems use: FREEZE the quantizers, append each
snapshot's (neighbor_id, cell, codes) rows — exact, because index rows
are a pure per-row function of (vector, centroids, codebooks) — and
RETRAIN only when a measured drift signal says the frozen geometry no
longer fits the data.

What the script does:

1. Train centroids + codebooks on the first snapshot, then FREEZE them.
2. Two snapshots land as parquet; two bookmarked ``ivfpq_index_ingest``
   runs drain them (availableNow checkpoint, idempotent __batch_id
   partitions), accruing the index incrementally.
3. Serve top-k from the accrued index (``ivfpq_serve``) and show it
   matches a from-scratch ``ivfpq_topk`` build on the union — the
   rebuild the ingest just avoided.
4. Price a THIRD, distribution-shifted snapshot with
   ``quantizer_drift``: its mean assignment distance ratchets above the
   in-distribution baseline — the measured retrain signal.

Run from the repo root:

    python examples/ann_incremental_pipeline.py [work_dir]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aws_data_engineering_spark.operators import similarity as S
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.streaming.ann_index import (
    ivfpq_index_ingest,
    load_index,
    quantizer_drift,
)


def vecs(seed: int, ids, dim: int = 8, shift: float = 0.0):
    rnd = random.Random(seed)
    return [
        (i, [rnd.uniform(-2, 2) + shift for _ in range(dim)]) for i in ids
    ]


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    raw, idx, cp = (os.path.join(work, d) for d in ("raw", "index", "cp"))
    spark = get_spark("ann-incremental-example")
    spark.sparkContext.setLogLevel("ERROR")

    def df(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    s1 = df(vecs(1, range(0, 60)))
    s2 = df(vecs(2, range(60, 120)))

    # 1. train on snapshot 1, then freeze
    cents = S.kmeans_centroids(s1, 4)
    books = S.pq_codebooks(s1)

    # 2. snapshots land; bookmarked runs accrue the index
    s1.coalesce(1).write.mode("append").parquet(raw)
    ivfpq_index_ingest(spark, raw, idx, cp, cents, books)
    s2.coalesce(1).write.mode("append").parquet(raw)
    ivfpq_index_ingest(spark, raw, idx, cp, cents, books)
    accrued = load_index(spark, idx)
    print(f"index rows accrued at ingest: {accrued.count()}")

    # 3. serve from the accrued index == from-scratch build on the union
    queries = df(vecs(3, range(1000, 1003)))
    got = sorted(
        map(
            tuple,
            S.ivfpq_serve(accrued, queries, cents, books, k=5).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            S.ivfpq_topk(
                s1.unionByName(s2),
                queries,
                k=5,
                centroids=cents,
                codebooks=books,
            ).collect(),
        )
    )
    assert got == want, "accrued serve and from-scratch build disagree"
    print("serve-from-accrued == from-scratch ivfpq_topk: OK")

    # 4. the retrain signal: a shifted snapshot prices worse
    base = quantizer_drift(df(vecs(9, range(200, 260))), cents).collect()[0]
    drift = quantizer_drift(
        df(vecs(9, range(200, 260), shift=4.0)), cents
    ).collect()[0]
    print(
        f"drift probe: in-dist mean_cell_dist={base.mean_cell_dist:.0f}  "
        f"shifted={drift.mean_cell_dist:.0f}  "
        f"ratio={drift.mean_cell_dist / base.mean_cell_dist:.1f}x"
    )
    assert drift.mean_cell_dist > base.mean_cell_dist
    print("shifted snapshot ratchets above baseline -> retrain signal: OK")
    if len(sys.argv) <= 1:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
