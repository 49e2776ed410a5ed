"""Probe: how many min-label propagation rounds do REAL dup graphs need?

r3 verdict ask #7 gates the large-star/small-star connected-components
variant on evidence of long chains: min-label propagation converges in
``diameter`` rounds, so it is the right algorithm iff dedup graphs stay
shallow. This measures rounds-to-fixpoint on the actual candidate
graphs the engine builds (MinHash-LSH pairs over documents, k-NN edges
over embeddings, both at sf0.1) and, as a control, on a synthetic
1000-node path graph — the adversarial shape that WOULD need the
star algorithm.

    python tools/cc_rounds_probe.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from healthcare_aws_data_engineering_spark.operators.graph import (
    connected_components,
)
from healthcare_aws_data_engineering_spark.operators.semdedup import knn_graph
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def rounds_to_fixpoint(pairs, src="doc_a", dst="doc_b", max_iter=64) -> dict:
    """Replicates connected_components' loop but reports the round count
    (the operator itself hides it); same arithmetic, same convergence
    test (labels only decrease, so equal (sum, count) == fixpoint)."""
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    edges = fwd.union(
        pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev = None
    for i in range(1, max_iter + 1):
        offered = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "lbl")
        labels = (
            labels.unionByName(offered)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        row = labels.agg(
            F.sum("lbl").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        cur = (row["s"], row["n"])
        if cur == prev:
            sizes = labels.groupBy("lbl").count()
            mx = sizes.agg(F.max("count")).collect()[0][0]
            ncl = sizes.count()
            return {
                "rounds_to_fixpoint": i - 1,
                "nodes": cur[1],
                "clusters": ncl,
                "max_cluster": mx,
            }
        prev = cur
    return {"rounds_to_fixpoint": f">{max_iter}", "nodes": prev[1]}


def star_rounds_to_fixpoint(pairs, src="doc_a", dst="doc_b", max_iter=64) -> dict:
    """Round count of the large-star/small-star variant (replicates
    _connected_components_star's loop with the identical convergence
    test — stationary deduped edge set as a (count, hash-sum) pair)."""
    raw = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        raw.filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    prev = None
    for i in range(1, max_iter + 1):
        nbrs = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least("__mn", "u").alias("m"))
        )
        edges = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates(["u", "v"])
        )
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).dropDuplicates(["u", "v"])
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        edges = (
            oriented.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates(["u", "v"])
            .localCheckpoint(eager=True)
        )
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        cur = (row["n"], row["h"])
        if cur == prev:
            return {"star_rounds_to_fixpoint": i - 1}
        prev = cur
    return {"star_rounds_to_fixpoint": f">{max_iter}"}


def main() -> None:
    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    embs = load_table(spark, SF_DIR, "embeddings")

    mh = minhash_lsh_pairs(docs).select("doc_a", "doc_b").persist()
    print(json.dumps({"graph": "minhash_lsh_pairs(sf0.1)"}
                     | rounds_to_fixpoint(mh) | star_rounds_to_fixpoint(mh)),
          flush=True)

    knn = knn_graph(embs, k=3, bands=4).select(
        F.col("vec_id").alias("doc_a"), F.col("neighbor_id").alias("doc_b")
    ).persist()
    print(json.dumps({"graph": "knn_graph(sf0.1, derived width)"}
                     | rounds_to_fixpoint(knn) | star_rounds_to_fixpoint(knn)),
          flush=True)

    # adversarial control: a 1000-node path — diameter 999, the shape
    # min-label propagation is WRONG for (and dedup graphs never are)
    chain = spark.range(999).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    print(json.dumps({"graph": "path_1000 (adversarial control)"}
                     | rounds_to_fixpoint(chain, max_iter=40)
                     | star_rounds_to_fixpoint(chain)), flush=True)

    # sanity: the operator's capped run agrees with the probe on clusters
    cc = connected_components(mh)
    print(json.dumps({
        "operator_clusters": cc.select("cluster_id").distinct().count(),
        "operator_nodes": cc.count(),
    }), flush=True)


if __name__ == "__main__":
    main()
