"""Deep-multiplier scaling probe over the heavy families (r13 verdict
ask #4: no sf1 testdata ships locally, so the last untested scale
decade is covered by replicating sf0.1 to M=16/32 — 32x the gate
corpus, the biggest input this container can time end-to-end).

Families probed (each is a full pipeline, not a primitive):

- **ANN serving** (`ivfpq_topk`, derived cells + absolute codebooks):
  index build + 50-query serve — cells_for keeps expected cell
  population constant, so probe cost per query should stay ~flat and
  total cost ~linear in the index-build scan.
- **CC clustering** (`minhash_lsh_pairs` -> `dup_clusters`): banded
  candidates, exact verify, min-label propagation — pair-bounded, one
  shuffle per round.
- **spans** (`span_dedup`): corpus-wide block dedup — window hashes
  map-side combine; cost ∝ token volume.
- **bloom decontamination** (`bloom_decontaminate`): bitset build +
  in-row probe + exact verify over candidates — bitset size follows
  the 10%-bucket eval set, probe is O(rows).

r15 additions (r14 verdict ask #4 — the families sharing the
flat-assignment/banding geometry the IVF probe caught super-linear):

- **knn_graph**: corpus×corpus banded-LSH candidate join + per-vector
  top-k — derived bands, bucket caps.
- **semantic_dedup** at derived cells, flat AND two_level assignment —
  the direct analogue of the ivfpq flat-vs-hatch pair (cells_for grows
  cells with the corpus, so the flat argmin is the suspect stage).
- **ppjoin** (`prefix_jaccard_join`): exact set-similarity join —
  prefix-filtered candidate join, no LSH.
- **media decode→dHash** (`encoded_media_from_documents` →
  `media_dhash`): the Arrow-codec image leg — container decode +
  exact-integer perceptual hash, expected flat per row (zero-exchange
  mapInPandas).

Run:   python tools/heavy_scale_probe.py [multipliers ...] [ops ...]
       # default M = 1 2 4 8 16; numeric args are multipliers,
       # non-numeric args name ops to run (default: all)

Prints one JSON line per (op, M); a final line gives per-doubling cost
ratios (≈2 linear, ≈4 quadratic). Record results in SCALING.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators import similarity as S
from healthcare_aws_data_engineering_spark.operators.decontam import (
    bloom_decontaminate,
)
from healthcare_aws_data_engineering_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from healthcare_aws_data_engineering_spark.operators.graph import dup_clusters
from healthcare_aws_data_engineering_spark.operators.multimodal import (
    encoded_media_from_documents,
    media_dhash,
)
from healthcare_aws_data_engineering_spark.operators.ppjoin import (
    prefix_jaccard_join,
)
from healthcare_aws_data_engineering_spark.operators.semdedup import (
    knn_graph,
    semantic_dedup,
)
from healthcare_aws_data_engineering_spark.operators.spans import span_dedup
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table
from tools.scale_probe import SF_DIR, replicate, timed


def main() -> None:
    ms = [int(x) for x in sys.argv[1:] if x.isdigit()] or [1, 2, 4, 8, 16]
    only = {x for x in sys.argv[1:] if not x.isdigit()}
    spark = get_spark("heavy-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    embs0 = load_table(spark, SF_DIR, "embeddings")
    docs0 = load_table(spark, SF_DIR, "documents")
    results: dict[str, dict[int, float]] = {}
    for m in ms:
        embs = replicate(embs0, "vec_id", m).persist()
        docs = replicate(docs0, "doc_id", m).persist()
        embs.count(), docs.count()
        queries = embs0.filter(F.col("vec_id") < 50)

        def run(name, fn):
            if only and name not in only:
                return
            sec, rows = timed(fn)
            results.setdefault(name, {})[m] = sec
            print(json.dumps({"op": name, "m": m, "sec": sec, "rows": rows}),
                  flush=True)

        # derived geometry: cells_for(n) inside ivfpq_topk; books rebuilt
        # per M (the build IS part of the measured pipeline)
        run(
            "ann_ivfpq_serve",
            lambda: S.ivfpq_topk(embs, queries, k=10, n_probe=4),
        )
        # the r14 linear-build hatch (coarse -> children assignment);
        # same serve, same derived geometry
        run(
            "ann_ivfpq_serve_2lvl",
            lambda: S.ivfpq_topk(
                embs, queries, k=10, n_probe=4, assign="two_level"
            ),
        )
        run(
            "cc_dup_clusters",
            lambda: dup_clusters(
                minhash_lsh_pairs(docs).select("doc_a", "doc_b")
            ),
        )
        run("span_dedup", lambda: span_dedup(docs))
        run("bloom_decontam", lambda: bloom_decontaminate(docs))
        # r15 additions — the unprobed heavy families
        run("knn_graph", lambda: knn_graph(embs))
        # derived cells (cells_for = n/200): the flat argmin is the
        # suspect super-linear stage; the 2lvl row prices the hatch
        run(
            "semdedup_flat",
            lambda: semantic_dedup(embs, assign="flat"),
        )
        run(
            "semdedup_2lvl",
            lambda: semantic_dedup(embs, assign="two_level"),
        )
        run("ppjoin", lambda: prefix_jaccard_join(docs))
        # the r15 remedy for the naive row's measured ~M² verify blowup
        # on clone replicas: collapse exact-duplicate token sets first
        run(
            "ppjoin_grouped",
            lambda: prefix_jaccard_join(docs, dedup_first=True),
        )
        run(
            "media_dhash",
            lambda: media_dhash(
                encoded_media_from_documents(docs).filter(
                    F.col("kind") == "image"
                )
            ),
        )
        embs.unpersist()
        docs.unpersist()
        spark.catalog.clearCache()

    for name, by_m in results.items():
        seq = sorted(by_m.items())
        ratios = [
            round(b / a, 2)
            for (_, a), (_, b) in zip(seq, seq[1:])
            if a > 0
        ]
        print(json.dumps({"op": name, "per_doubling": ratios}), flush=True)


if __name__ == "__main__":
    main()
