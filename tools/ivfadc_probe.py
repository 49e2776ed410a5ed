"""IVFADC residual-mode measurement (r13 verdict ask #5): record the
recall and ADC-distortion numbers behind the "residual mode helps on
clustered corpora" claim, at equal (m, codes) budget, on corpora where
the effect direction differs:

- a SEEDED CLUSTERED corpus (mixture of well-separated Gaussians — the
  structure real embedding models produce): residual codes only cover
  the small within-cell offset ball, so ADC error should drop and
  recall should rise;
- the DRIVER'S ISOTROPIC corpus (sf0.001/sf0.01 embeddings — iid
  uniform directions): distances concentrate, code-priced rankings are
  noise in BOTH modes, and residual buys little — the honest negative
  control.

Run:   python tools/ivfadc_probe.py [n_clustered ...]    # default 2000 8000

Prints one JSON line per (corpus, mode) with recall@10 vs exact and
mean relative ADC error over the top-30 priced pairs. Results recorded
in SCALING.md (r14 section).
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, ".")

from pyspark.sql import Row, functions as F

from healthcare_aws_data_engineering_spark.operators import similarity as S
from healthcare_aws_data_engineering_spark.operators.similarity import (
    quantize_py,
)
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

K = 10
N_QUERIES = 20
DIM = 64
N_CLUSTERS = 16


def clustered_rows(n: int, seed: int = 7) -> list[Row]:
    """Mixture of N_CLUSTERS Gaussians at radius-4 sign-pattern centers
    with sigma 0.4 — well separated (the KMeans-friendly regime)."""
    rnd = random.Random(seed)
    centers = [
        [(1.0 if (c * 2654435761 >> b) & 1 else -1.0) * 4.0 for b in range(DIM)]
        for c in range(N_CLUSTERS)
    ]
    return [
        Row(
            vec_id=i,
            embedding=[v + rnd.gauss(0.0, 0.4) for v in centers[i % N_CLUSTERS]],
        )
        for i in range(n)
    ]


def measure(spark, embs, label: str) -> None:
    queries = embs.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embs, queries, k=K).collect()
    }
    n = embs.count()
    n_cells = S.cells_for(n, 200)
    cents = S.kmeans_centroids(embs, n_cells)
    vecs = {
        r.vec_id: [quantize_py(x) for x in r.embedding]
        for r in embs.collect()
    }

    def sqd(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    for residual in (False, True):
        out = S.ivfpq_topk(
            embs, queries, k=30, n_centroids=n_cells, n_probe=4,
            centroids=cents, residual=residual,
        ).collect()
        errs = [
            abs(r.adist - sqd(vecs[r.query_id], vecs[r.neighbor_id]))
            / max(sqd(vecs[r.query_id], vecs[r.neighbor_id]), 1)
            for r in out
        ]
        top = {
            (r.query_id, r.neighbor_id) for r in out if r.rank <= K
        }
        print(
            json.dumps(
                {
                    "corpus": label,
                    "n": n,
                    "cells": n_cells,
                    "residual": residual,
                    "recall_at_10": round(len(exact & top) / len(exact), 3),
                    "mean_rel_adc_err": round(sum(errs) / len(errs), 4),
                }
            ),
            flush=True,
        )


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [2000, 8000]
    spark = get_spark("ivfadc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        embs = spark.createDataFrame(clustered_rows(n)).persist()
        embs.count()
        measure(spark, embs, f"clustered_{n}")
        embs.unpersist()
    iso = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    ).persist()
    iso.count()
    measure(spark, iso, "isotropic_sf0.01")
    iso.unpersist()


if __name__ == "__main__":
    main()
