"""End-to-end IMAGE dedup with this engine's multimodal operators —
the media half of the training-data story in one script, no driver
contract required.

Chain (each stage is an independently-oracled driver query; this
script shows how they compose as a library):

1. **Cheap screen** — `media_stats`: sizes / content hash / metadata
   as a pure-JVM projection, the pre-filter that drops corrupt or
   oversized media before any decode touches bytes.
2. **Exact dedup** — one hash-groupBy on the content md5 (byte-equal
   files collapse before perceptual work; cheapest win first).
3. **Perceptual hash** — `media_dhash`: real decode (PPM/BMP), integer
   ITU-R 601 luma, 9x8 grid gradients, zero-exchange Arrow stage.
4. **Near-dup pairs** — `dhash_near_dup_pairs`: banded Hamming join,
   bands DERIVED from max_hamming (pigeonhole-exact recall; cap only
   if you can budget the measured loss — SCALING.md r11).
5. **Clusters + keepers** — `graph.dup_clusters`: distributed
   min-label connected components; one canonical keeper per cluster.
6. **Online probe** — `streaming.neardup.dhash_near_dup_stream`:
   incoming images checked against the batch index (run here in its
   batch-parity mode; point it at a readStream source in production).

Run from the repo root:

    python examples/media_dedup_pipeline.py [sf_dir]  # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators import (
    multimodal as M,
)
from healthcare_aws_data_engineering_spark.operators.graph import dup_clusters
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table
from healthcare_aws_data_engineering_spark.streaming.neardup import (
    dhash_near_dup_stream,
)

MAX_HAMMING = 3  # bands derived: 4 x 4-hex, recall exact by pigeonhole


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("media-dedup-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    orig = M.encoded_media_from_documents(docs).filter(
        F.col("kind") == "image"
    )
    # demo corpus with real dup mass: byte-exact copies (stage-2 food)
    # and one-byte-perturbed variants (stage-3/4/5 food)
    copies = orig.withColumn(
        "media_id", F.col("media_id") + F.lit(2_000_000_000)
    )
    pert = (
        M.encoded_media_from_documents(docs, perturb=True)
        .filter(F.col("kind") == "image")
        .withColumn("media_id", F.col("media_id") + F.lit(1_000_000_000))
    )
    media = orig.unionByName(copies).unionByName(pert)

    # 1. cheap screen: drop anything structurally implausible before decode
    stats = M.media_stats(media)
    keep_ids = stats.filter(
        (F.col("n_bytes") > 0) & (F.col("n_pixels") <= 1 << 24)
    ).select("media_id")
    media = media.join(keep_ids, "media_id")

    # 2. exact dedup on content bytes (md5 groupBy — byte-equal files
    # never reach the perceptual stage)
    exact = (
        M.media_stats(media)
        .groupBy("content_md5")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    reps = media.join(exact.select("media_id"), "media_id")
    n_exact_dropped = media.count() - reps.count()

    # 3-4. perceptual hash + exact-recall banded near-dup pairs
    hashes = M.media_dhash(reps)
    pairs = M.dhash_near_dup_pairs(hashes, max_hamming=MAX_HAMMING).select(
        "media_a", "media_b"
    )

    # 5. clusters + keepers
    clusters = dup_clusters(pairs, "media_a", "media_b").select(
        F.col("doc_id").alias("media_id"),
        "cluster_id",
        "cluster_size",
        "is_keeper",
    )
    n_clusters = clusters.select("cluster_id").distinct().count()
    n_dropped = clusters.filter(~F.col("is_keeper")).count()
    print(
        f"exact dedup dropped {n_exact_dropped}; perceptual: "
        f"{n_clusters} clusters, {n_dropped} non-keepers dropped"
    )

    # 6. online probe (batch-parity mode): clones of the first few
    # survivors arrive as "new" images — every one must flag against
    # its source in the index
    incoming = (
        orig.limit(20)
        .select(
            (F.col("media_id") + F.lit(3_000_000_000)).alias("media_id"),
            "content",
        )
        .withColumn("ts", F.current_timestamp())
    )
    hits = dhash_near_dup_stream(
        incoming, hashes.select("media_id", "dhash"), max_hamming=6
    )
    n_hits = hits.count()
    print(f"online probe: {n_hits} incoming images flagged as near-dups")
    assert n_hits > 0
    spark.stop()


if __name__ == "__main__":
    main()
