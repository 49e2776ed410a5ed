"""MinHash-LSH recall probe: candidate recall of
``dedup.minhash_lsh_pairs`` against EXACT all-pairs shingle-Jaccard
ground truth — the text-family companion of ``tools/recall_probe.py``.

Why the question differs from the hyperplane family: MinHash band keys
are md5 hashes of signature rows — the key space is unbounded, so there
is NO analogue of the width knob and no bucket-saturation collapse from
corpus growth. Bucket population is driven by duplicate-cluster
structure (docs with equal band rows), not by n/2^width. Per-pair
collision probability is the textbook ``1 − (1 − j^r)^b`` (j = true
Jaccard, r = rows/band, b = bands) INDEPENDENT of corpus size; the only
scale hazard is the per-bucket cap (50) when a duplicate cluster
outgrows it. This probe verifies both claims empirically:

- recall per true-Jaccard bucket at M=1 vs the theoretical curve;
- at M=4 (clone replicas with disjoint ids): intra-replica recall must
  equal the M=1 value (scale-invariance) and clone pairs (Jaccard 1.0,
  guaranteed band collisions) must be recalled at ~1.0 until a cluster
  (= M clones sharing every bucket) would outgrow the cap.

Exact ground truth via the doc × shingle incidence matrix (5k docs ×
~27k shingles at sf0.1): intersections = A·Aᵀ (one BLAS matmul),
|union| = |a| + |b| − |a∩b|.

    python tools/minhash_recall_probe.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators.dedup import (
    minhash_lsh_pairs,
    word_shingles,
)
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
ID_STRIDE = 100_000_000
J_BUCKETS = [(0.3, 0.5), (0.5, 0.8), (0.8, 0.999), (0.999, 1.01)]
R, B = 2, 4  # minhash_lsh_pairs defaults: 8 perms = 4 bands x 2 rows


def exact_jaccard_pairs(shingle_sets: dict[int, set[str]], t: float):
    """All pairs with Jaccard ≥ t, via dense incidence matmul."""
    ids = sorted(shingle_sets)
    vocab: dict[str, int] = {}
    for s in shingle_sets.values():
        for sh in s:
            vocab.setdefault(sh, len(vocab))
    A = np.zeros((len(ids), len(vocab)), dtype=np.float32)
    for r, i in enumerate(ids):
        for sh in shingle_sets[i]:
            A[r, vocab[sh]] = 1.0
    sizes = A.sum(axis=1)
    pairs: dict[tuple[int, int], float] = {}
    for lo in range(0, len(ids), 1000):
        hi = min(lo + 1000, len(ids))
        inter = A[lo:hi] @ A.T  # (block, n)
        for r in range(hi - lo):
            gi = lo + r
            union = sizes[gi] + sizes - inter[r]
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter[r] / union, 0.0)
            over = np.nonzero(jac >= t)[0]
            for j in over:
                if gi < j:
                    pairs[(ids[gi], ids[j])] = float(jac[j])
    return pairs


def bucketed(true_pairs: dict, got: set) -> dict:
    out = {}
    for lo, hi in J_BUCKETS:
        tot = [p for p, j in true_pairs.items() if lo <= j < hi]
        if tot:
            hit = sum(1 for p in tot if p in got)
            pred = 1 - (1 - ((lo + min(hi, 1.0)) / 2) ** R) ** B
            out[f"[{lo},{hi})"] = {
                "n": len(tot),
                "recall": round(hit / len(tot), 3),
                "predicted_mid": round(pred, 3),
            }
    return out


def main() -> None:
    spark = get_spark("minhash-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # exact ground truth from the very shingle sets the operator hashes
    sets_rows = docs.select(
        F.col("doc_id"), word_shingles(F.col("text")).alias("sh")
    ).collect()
    shingle_sets = {r[0]: set(r[1]) for r in sets_rows}
    true_pairs = exact_jaccard_pairs(shingle_sets, 0.3)

    # ---- M=1 ----
    got = {
        (min(r[0], r[1]), max(r[0], r[1]))
        for r in minhash_lsh_pairs(docs).select("doc_a", "doc_b").collect()
    }
    print(json.dumps({
        "probe": "minhash_lsh_pairs", "m": 1, "n_docs": len(shingle_sets),
        "true_pairs_j>=0.3": len(true_pairs), "candidates": len(got),
        "recall_by_jaccard": bucketed(true_pairs, got),
    }), flush=True)

    # ---- M=4 clone replicas: scale-invariance + clone-pair recall ----
    m = 4
    rep = docs
    for i in range(1, m):
        rep = rep.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + i * ID_STRIDE)
        )
    got4 = {
        (min(r[0], r[1]), max(r[0], r[1]))
        for r in minhash_lsh_pairs(rep).select("doc_a", "doc_b").collect()
    }
    intra = {p for p in got4 if p[0] < ID_STRIDE and p[1] < ID_STRIDE}
    clone_expect = len(shingle_sets) * (m * (m - 1) // 2)
    clones = sum(
        1 for a, b in got4 if (b - a) % ID_STRIDE == 0 and a != b
    )
    print(json.dumps({
        "probe": "minhash_lsh_pairs", "m": m, "n_docs": len(shingle_sets) * m,
        "intra_replica_recall_by_jaccard": bucketed(true_pairs, intra),
        "clone_pairs_found": clones, "clone_pairs_expected": clone_expect,
        "clone_recall": round(clones / clone_expect, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
