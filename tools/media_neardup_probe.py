"""Image near-dup growth + recall probe: ``dhash_near_dup_pairs``
against EXACT brute-force Hamming ground truth — the image-family
companion of ``tools/minhash_recall_probe.py`` (r10 verdict: every
other banded family had a measured ×1/×2/×4 probe; this one only
argued the shape).

Corpus: the sf0.1 documents' image rows (doc_id % 3 != 1 → PPM/BMP),
each with its one-byte-perturbed clone (the gate fixture), replicated
×M with disjoint id spaces. Replicas are literal text clones, so their
dHashes are IDENTICAL — the corpus deliberately contains
byte-identical image clusters of size 2M (M orig + M pert replicas
within ≤2 bits of each other), the exact worst case the r10 verdict
flagged: one (band, value) bucket with O(k²) candidate fan-out.

Ground truth: all-pairs 64-bit popcount over the collected hashes
(uint64 XOR + uint8 LUT, chunked numpy — exact, no sampling).

Per M ∈ {1, 2, 4}, three regimes of the banded join (hash computation
is shared/persisted; timings isolate the pair join):

- exact gate regime  (max_hamming=3, derived 4 bands, uncapped)
- default regime     (max_hamming=6, derived 8 bands, uncapped) — the
  r10 fix: recall must be 1.0 by pigeonhole (old n_bands=4 default
  measured ~0.62 on hamming-6 pairs)
- capped regime      (max_hamming=6, max_bucket=50) — the 100 TB skew
  hatch; recall loss is exactly the pairs inside dropped buckets

Prints one JSON line per (regime, M) with wall sec, pairs, recall, and
the max (band, value) bucket size; recorded in SCALING.md.

    python tools/media_neardup_probe.py [multipliers ...]   # default 1 2 4
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators import (
    multimodal as M,
)
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
ID_STRIDE = 100_000_000
PERT_OFFSET = 1_000_000_000

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def brute_pairs_count(hashes: np.ndarray, max_h: int) -> dict[int, int]:
    """Exact count of unordered pairs at each Hamming distance ≤ max_h:
    chunked XOR over uint64, popcount via uint8 LUT. Returns
    {distance: n_pairs}."""
    n = len(hashes)
    counts: dict[int, int] = {d: 0 for d in range(max_h + 1)}
    chunk = 512
    for s in range(0, n, chunk):
        block = hashes[s : s + chunk]
        x = block[:, None] ^ hashes[None, :]  # (c, n) uint64
        pc = _POP[x.view(np.uint8)].reshape(len(block), n, 8).sum(axis=2)
        for d in range(max_h + 1):
            eq = np.argwhere(pc == d)
            # count only i < j in GLOBAL index space (i = s + row)
            counts[d] += int(np.sum(eq[:, 0] + s < eq[:, 1]))
    return counts


def main() -> None:
    ms = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("media-neardup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")

    for m in ms:
        docs = docs0
        for i in range(1, m):
            docs = docs.unionByName(
                docs0.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * ID_STRIDE)
                )
            )
        orig = M.encoded_media_from_documents(docs)
        pert = M.encoded_media_from_documents(docs, perturb=True).withColumn(
            "media_id", F.col("media_id") + F.lit(PERT_OFFSET)
        )
        both = orig.unionByName(pert).filter(F.col("kind") == "image")
        hashes_df = M.media_dhash(both).select("media_id", "dhash").persist()
        n_hashes = hashes_df.count()

        # ---- exact ground truth (driver-side, chunked numpy) ----
        pdf = hashes_df.toPandas()
        hs = np.array(
            [int(h, 16) for h in pdf["dhash"]], dtype=np.uint64
        )
        truth = brute_pairs_count(hs, 6)
        true_le3 = sum(truth[d] for d in range(4))
        true_le6 = sum(truth[d] for d in range(7))

        # max (band, value) bucket size at 8 bands (the capped regime's
        # bucket key) — the identical-cluster fan-out the cap bounds
        band_sizes = (
            hashes_df.select(
                F.explode(
                    F.array(
                        *[
                            F.concat(
                                F.lit(f"{i}|"),
                                F.substring("dhash", i * 2 + 1, 2),
                            )
                            for i in range(8)
                        ]
                    )
                ).alias("bv")
            )
            .groupBy("bv")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

        def run(regime: str, true_n: int, **kw) -> None:
            t0 = time.perf_counter()
            # hashes_df is persisted above — skip the operator's
            # internal localCheckpoint (redundant re-materialization
            # per regime run; r11 advice).
            got = M.dhash_near_dup_pairs(
                hashes_df, checkpoint=False, **kw
            ).count()
            sec = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {
                        "regime": regime,
                        "m": m,
                        "hashes": n_hashes,
                        "sec": sec,
                        "pairs": got,
                        "true_pairs": true_n,
                        "recall": round(got / true_n, 4) if true_n else None,
                        "max_bucket": int(band_sizes),
                    }
                ),
                flush=True,
            )

        run("exact_h3", true_le3, max_hamming=3)
        run("default_h6", true_le6, max_hamming=6)
        run("capped_h6_b50", true_le6, max_hamming=6, max_bucket=50)

        # ---- the documented 100 TB composition, measured: exact-dedup
        # the byte-identical hash clusters FIRST (one groupBy keeps one
        # representative per distinct dhash), run the capped banded join
        # over representatives only. Ground truth for this regime is the
        # pair set over DISTINCT hashes (intra-cluster pairs are exact
        # dups owned by the exact-dedup pass, cross-cluster pairs expand
        # by cluster-size products downstream).
        reps_df = (
            hashes_df.groupBy("dhash")
            .agg(F.min("media_id").alias("media_id"))
            .select("media_id", "dhash")
            .persist()
        )
        n_reps = reps_df.count()
        uh = np.unique(hs)
        rep_truth = brute_pairs_count(uh, 6)
        rep_le6 = sum(rep_truth[d] for d in range(7))
        t0 = time.perf_counter()
        got = M.dhash_near_dup_pairs(
            reps_df, max_hamming=6, max_bucket=50, checkpoint=False
        ).count()
        sec = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "regime": "dedup_then_capped_h6_b50",
                    "m": m,
                    "hashes": n_reps,
                    "sec": sec,
                    "pairs": got,
                    "true_pairs": rep_le6,
                    "recall": round(got / rep_le6, 4) if rep_le6 else None,
                    "max_bucket": None,
                }
            ),
            flush=True,
        )
        reps_df.unpersist()
        hashes_df.unpersist()


if __name__ == "__main__":
    main()
