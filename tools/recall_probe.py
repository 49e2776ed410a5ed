"""Recall probe: measure ANN/dedup RECALL against brute-force ground
truth as the corpus grows — the claim the cost-only scale probe
(`tools/scale_probe.py`) cannot make.

r4 verdict ask #2: the r4 probe proved derived-width LSH output stays
NON-EMPTY under corpus growth (the pinned-width negative control goes to
0 rows), but non-emptiness is not recall. This probe computes, at
M = 1/2/4/8 replicas of the sf0.1 embeddings (2k × 64 → up to 16k
vectors, small enough for exact numpy ground truth):

- **recall@k of derived-width `knn_graph`** vs exact cosine top-k
  (mean over vectors of |approx top-k ∩ true top-k| / k);
- **precision/recall of derived-width `embedding_near_dup`** vs the
  exact all-pairs cosine≥threshold set (precision is 1.0 by
  construction — candidates are verified with the exact integer
  cosine — so recall is the informative number);
- **candidate-pair count** per near-dup run (r4 verdict ask #8: splits
  the derived-width cost growth into candidate-pair growth vs
  signature-compute growth);
- **co-cluster recall of derived-cells `semantic_dedup`** (r4 verdict
  ask #3): of the ground-truth near-dup pairs, the fraction landing in
  the same coarse cell — the quantity the derived cell count must hold
  up as the corpus grows — plus the derived cell count and the max cell
  population (bounded per-cluster pair work).

Unlike the cost probe, replicas here must be DISTINCT vectors (verbatim
copies would make every vector's true top-k its own clones and recall
trivially ill-posed), so replica i circularly shifts the embedding by
7·i dimensions — norm-preserving, deterministic, and near-orthogonal to
the original for these synthetic embeddings.

    python tools/recall_probe.py [multipliers ...]    # default 1 2 4 8

Prints one JSON line per (operator, M); results go into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import DataFrame, functions as F

from healthcare_aws_data_engineering_spark.operators import similarity as S
from healthcare_aws_data_engineering_spark.operators.dedup import _bucket_cap
from healthcare_aws_data_engineering_spark.operators.semdedup import (
    knn_graph,
    semantic_dedup,
)
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
ID_STRIDE = 100_000_000
K = 3
NEAR_DUP_T = 0.35
DIM = 64


def replicate_shifted(df: DataFrame, m: int) -> DataFrame:
    """×m union with disjoint id spaces AND distinct payloads: replica i
    circularly shifts the embedding by (7·i) mod DIM dims."""
    out = df
    for i in range(1, m):
        s = (7 * i) % DIM
        shifted = F.concat(
            F.slice(F.col("embedding"), s + 1, DIM - s),
            F.slice(F.col("embedding"), 1, s),
        )
        out = out.unionByName(
            df.select(
                (F.col("vec_id") + i * ID_STRIDE).alias("vec_id"),
                shifted.alias("embedding"),
                "label",
            )
        )
    return out


def ground_truth(ids: np.ndarray, X: np.ndarray, k: int, t: float):
    """Exact cosine top-k per row and the all-pairs ≥t map (pair →
    cosine), blocked matmul (N ≤ 16k ⇒ ≤ 2.56e8 sims, seconds in
    float32)."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(ids)
    topk: dict[int, set[int]] = {}
    pairs: dict[tuple[int, int], float] = {}
    for lo in range(0, n, 2000):
        hi = min(lo + 2000, n)
        sims = Xn[lo:hi] @ Xn.T  # (block, n)
        for r in range(hi - lo):
            row = sims[r].copy()
            row[lo + r] = -2.0  # exclude self
            idx = np.argpartition(row, -k)[-k:]
            topk[int(ids[lo + r])] = {int(ids[j]) for j in idx}
            over = np.nonzero(row >= t)[0]
            for j in over:
                a, b = int(ids[lo + r]), int(ids[j])
                if a < b:
                    pairs[(a, b)] = float(row[j])
    return topk, pairs


SIM_BUCKETS = [(0.35, 0.40), (0.40, 0.45), (0.45, 0.50), (0.50, 1.01)]


def bucketed_recall(true_pairs: dict, got_pairs: set) -> dict:
    """Recall per pair-similarity bucket — LSH recall is a function of
    pair similarity, so a single blended number hides the decay (and
    the fix)."""
    out = {}
    for lo, hi in SIM_BUCKETS:
        tot = [p for p, s in true_pairs.items() if lo <= s < hi]
        if tot:
            hit = sum(1 for p in tot if p in got_pairs)
            out[f"[{lo},{hi})"] = {
                "n": len(tot), "recall": round(hit / len(tot), 3)
            }
    return out


def predicted_recall(cos: float, width: int, bands: int) -> float:
    """Theoretical hyperplane-LSH recall at pair similarity ``cos``."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, cos))) / math.pi
    return round(1.0 - (1.0 - p ** width) ** bands, 3)


def candidate_pairs(embs: DataFrame, plane_matrix, bands: int,
                    max_bucket: int = 200) -> int:
    """Distinct candidate-pair count of the near-dup banding (the work
    the verify stage pays), replicated from embedding_near_dup's
    candidate leg without the threshold filter."""
    width = len(plane_matrix) // bands
    staged = embs.select(
        F.col("vec_id").alias("doc"),
        S.quantize_vec(F.col("embedding")).alias("__q"),
    ).select(
        "doc",
        S.sig_chunks_q(F.col("__q"), plane_matrix, width).alias("__sigc"),
    )
    banded = staged.select(
        "doc",
        F.posexplode(
            S.band_keys_from_chunks(F.col("__sigc"), width, bands)
        ).alias("band", "band_key"),
    )
    capped = _bucket_cap(banded, "band_key", max_bucket).select(
        "band", "band_key", "doc"
    )
    return (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .count()
    )


def multiprobe_leg(spark, embs0) -> None:
    """lsh_topk query-side comparison at the base corpus: same 2-band
    8-bit index probed plain vs Hamming-1 (multiprobe), plus the
    4-band plain index of equal total planes — quantifies 'probes buy
    recall where bands buy index size'."""
    embs = embs0.select("vec_id", "embedding").persist()
    embs.count()
    rows = embs.collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float32)
    true_topk, _ = ground_truth(ids, X, 10, 2.0)  # top-10 only
    q = embs.filter(F.col("vec_id") < 100)
    pm16 = S.rademacher_planes(16, DIM)
    legs = [
        ("plain_2x8", dict(bands=2, plane_matrix=pm16)),
        ("multiprobe_2x8", dict(bands=2, plane_matrix=pm16, multiprobe=True)),
        ("plain_4x4", dict(bands=4, plane_matrix=pm16)),
    ]
    for name, kw in legs:
        t0 = time.perf_counter()
        got = S.lsh_topk(embs, q, k=10, **kw).collect()
        sec = round(time.perf_counter() - t0, 2)
        approx: dict[int, set[int]] = {}
        for r in got:
            approx.setdefault(r[0], set()).add(r[1])
        qids = [int(i) for i in ids if i < 100]
        hits = sum(len(approx.get(i, set()) & true_topk[i]) for i in qids)
        print(json.dumps({
            "op": f"lsh_topk_{name}", "n": len(ids), "queries": len(qids),
            "sec": sec,
            "recall_at_10": round(hits / (10 * len(qids)), 3),
        }), flush=True)
    embs.unpersist()


def ivf_leg(spark, embs0, m: int) -> None:
    """IVF derived-cells recall: with cells ∝ n (bounded per-probe cost),
    a FIXED n_probe covers a shrinking corpus fraction — the IVF
    analogue of the fixed-bands recall decay — and n_probe is the
    recall dial. Trained cells concentrate neighbors, softening the
    trade. 100 queries, recall@10 vs exact ground truth."""
    embs = replicate_shifted(embs0, m).persist()
    n = embs.count()
    rows = embs.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float32)
    true_topk, _ = ground_truth(ids, X, 10, 2.0)
    q = embs.filter(F.col("vec_id") < 100)
    qids = [int(i) for i in ids if i < 100]
    n_cells = S.cells_for(n, 200)
    for method in ("sample", "kmeans"):
        for n_probe in (1, 4, min(16, n_cells)):
            t0 = time.perf_counter()
            got = S.ivf_topk(
                embs, q, k=10, n_probe=n_probe, centroids=method
            ).collect()
            sec = round(time.perf_counter() - t0, 2)
            approx: dict[int, set[int]] = {}
            for r in got:
                approx.setdefault(r[0], set()).add(r[1])
            hits = sum(
                len(approx.get(i, set()) & true_topk[i]) for i in qids
            )
            print(json.dumps({
                "op": f"ivf_topk_derived_{method}", "m": m, "n": n,
                "cells": n_cells, "n_probe": n_probe, "sec": sec,
                "recall_at_10": round(hits / (10 * len(qids)), 3),
            }), flush=True)
    embs.unpersist()


def main() -> None:
    ms = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    embs0 = load_table(spark, SF_DIR, "embeddings")
    if 1 in ms:
        multiprobe_leg(spark, embs0)
    for m in (x for x in (1, 2, 4) if x in ms):
        ivf_leg(spark, embs0, m)
    for m in ms:
        embs = replicate_shifted(embs0, m).persist()
        n = embs.count()
        rows = embs.select("vec_id", "embedding").collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        X = np.array([r[1] for r in rows], dtype=np.float32)
        true_topk, true_pairs = ground_truth(ids, X, K, NEAR_DUP_T)

        # ---- knn_graph: fixed bands=4 (r4 leg) vs auto-scaled bands ----
        # The corpus' true top-3 neighbors sit at cos ≈ 0.34-0.45 (median
        # 0.38), so the auto leg designs for cos 0.40 — matching the
        # question the recall@k number asks of THIS corpus. For real
        # near-dup corpora design_cos is 0.9+ and the band counts are
        # far smaller (bands_for docstring).
        width = S.width_for(n, 200)
        for leg, bands in (
            ("fixed4", 4),
            ("auto", S.bands_for(width, design_cos=0.40)),
        ):
            t0 = time.perf_counter()
            got = (
                knn_graph(
                    embs, k=K, bands=bands, target_bucket=200,
                )
                .select("vec_id", "neighbor_id")
                .collect()
            )
            sec = round(time.perf_counter() - t0, 2)
            approx: dict[int, set[int]] = {}
            for r in got:
                approx.setdefault(r[0], set()).add(r[1])
            hits = sum(
                len(approx.get(i, set()) & nbrs)
                for i, nbrs in true_topk.items()
            )
            recall_k = round(hits / (K * len(true_topk)), 3)
            print(json.dumps({
                "op": f"knn_graph_derived_{leg}", "m": m, "n": n,
                "width": width, "bands": bands, "sec": sec,
                "recall_at_k": recall_k, "k": K,
                "predicted_recall_at_cos0.40":
                    predicted_recall(0.40, width, bands),
            }), flush=True)

        # ---- embedding_near_dup: fixed bands=8 (r4 leg) vs auto ----
        # auto = bands from the dedup threshold itself (design_cos =
        # threshold), the operator's bands=None default.
        for leg, bands in (
            ("fixed8", 8),
            ("auto", S.bands_for(width, design_cos=NEAR_DUP_T)),
        ):
            planes = S.derive_planes(embs, bands=bands, target_bucket=200)
            t0 = time.perf_counter()
            got_pairs = {
                (min(r[0], r[1]), max(r[0], r[1]))
                for r in S.embedding_near_dup(
                    embs, threshold=NEAR_DUP_T, bands=bands,
                    plane_matrix=planes,
                ).select("doc_a", "doc_b").collect()
            }
            sec = round(time.perf_counter() - t0, 2)
            n_cand = candidate_pairs(embs, planes, bands=bands)
            tp = sum(1 for p in got_pairs if p in true_pairs)
            print(json.dumps({
                "op": f"embedding_near_dup_derived_{leg}", "m": m, "n": n,
                "width": width, "bands": bands, "sec": sec,
                "true_pairs": len(true_pairs), "found_pairs": len(got_pairs),
                "candidate_pairs": n_cand,
                "precision": round(tp / len(got_pairs), 3)
                if got_pairs else None,
                "recall": round(tp / len(true_pairs), 3)
                if true_pairs else None,
                "recall_by_sim": bucketed_recall(true_pairs, got_pairs),
            }), flush=True)

        # ---- semantic_dedup, derived cells: sampled vs trained ----
        for method in ("sample", "kmeans"):
            t0 = time.perf_counter()
            sd = semantic_dedup(
                embs, None, threshold=NEAR_DUP_T, centroid_method=method
            ).persist()
            removed = sd.filter(F.col("keep") == 0).count()
            cell_sizes = sd.groupBy("cluster").count()
            max_cell = cell_sizes.agg(F.max("count")).collect()[0][0]
            n_cells_used = cell_sizes.count()
            sec = round(time.perf_counter() - t0, 2)
            cell_of = {
                r[0]: r[1] for r in sd.select("vec_id", "cluster").collect()
            }
            co = sum(
                1 for a, b in true_pairs if cell_of.get(a) == cell_of.get(b)
            )
            co_pairs = {
                p for p in true_pairs if cell_of.get(p[0]) == cell_of.get(p[1])
            }
            sd.unpersist()
            print(json.dumps({
                "op": f"semantic_dedup_derived_cells_{method}", "m": m, "n": n,
                "cells_derived": S.cells_for(n), "cells_nonempty": n_cells_used,
                "max_cell": max_cell, "removed": removed, "sec": sec,
                "true_pairs": len(true_pairs),
                "co_cluster_recall": round(co / len(true_pairs), 3)
                if true_pairs else None,
                # co-location is similarity-dependent (SemDeDup is a
                # cluster-LOCAL dedup): report it per similarity band too
                "co_cluster_recall_by_sim":
                    bucketed_recall(true_pairs, co_pairs),
            }), flush=True)
        embs.unpersist()


if __name__ == "__main__":
    main()
