"""Stage-level decomposition of knn_graph's heavy-probe cliff (r15:
12s at M=8 -> 121s at M=16 while output rows only doubled — the
per-doubling table alone cannot name the binding stage, so this probe
times the pipeline's three billable stages separately at each M:

1. **banding** — signature HOFs + posexplode + bucket cap (cost ∝
   n · bands · width · dim),
2. **candidates** — the capped bucket self-join + ID-only
   dropDuplicates (cost ∝ Σ|bucket|² and the distinct shuffle), with
   the post-distinct candidate-pair COUNT reported (the fan-out the
   geometry bounds), and
3. **full graph** — candidates + the exact-cosine join-back + per-id
   top-k window (cost ∝ candidates · dim, the HOF dot products).

Replicates the gate corpus like heavy_scale_probe (disjoint id spaces;
clone replicas share identical signatures, so bucket populations grow
×M until the cap binds — the adversarial-but-informative regime).

Run:  python tools/knn_stage_probe.py [multipliers ...]  # default 8 16 32
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators import similarity as S
from healthcare_aws_data_engineering_spark.operators.dedup import _bucket_cap
from healthcare_aws_data_engineering_spark.operators.semdedup import knn_graph
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table
from tools.scale_probe import SF_DIR, replicate


def main() -> None:
    ms = [int(x) for x in sys.argv[1:]] or [8, 16, 32]
    spark = get_spark("knn-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    embs0 = load_table(spark, SF_DIR, "embeddings")
    for m in ms:
        embs = replicate(embs0, "vec_id", m).persist()
        n = embs.count()
        plane_matrix, width, bands = S._resolve_index(
            embs, "embedding", None, None, 200, 0.9, 0.8
        )
        staged = embs.select(
            F.col("vec_id").alias("vec_id"),
            S.quantize_vec(F.col("embedding")).alias("__q"),
        ).select(
            "vec_id",
            S.sig_chunks_q(F.col("__q"), plane_matrix, width).alias("__sigc"),
        )
        banded = staged.select(
            "vec_id",
            F.posexplode(
                S.band_keys_from_chunks(F.col("__sigc"), width, bands)
            ).alias("band", "band_key"),
        )
        t0 = time.perf_counter()
        n_banded = banded.count()
        t_band = time.perf_counter() - t0
        capped = _bucket_cap(banded, "band_key", 200).select(
            "band", "band_key", "vec_id"
        )
        cands = (
            capped.alias("a")
            .join(
                capped.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("neighbor_id"),
            )
            .dropDuplicates(["vec_id", "neighbor_id"])
        )
        t0 = time.perf_counter()
        n_cands = cands.count()
        t_cands = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_out = knn_graph(embs).count()
        t_full = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "m": m,
                    "n": n,
                    "width": width,
                    "bands": bands,
                    "banded_rows": n_banded,
                    "cand_pairs": n_cands,
                    "out_rows": n_out,
                    "sec_banding": round(t_band, 2),
                    "sec_candidates": round(t_cands, 2),
                    "sec_full": round(t_full, 2),
                }
            ),
            flush=True,
        )
        embs.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
