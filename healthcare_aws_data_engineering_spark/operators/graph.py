"""Distributed connected components over a pair list — the clustering
step that turns near-duplicate PAIRS (MinHash-LSH / SimHash / embedding
candidates, verified by exact Jaccard) into duplicate CLUSTERS with one
canonical keeper each. The reference has no counterpart (its dedup is
single-key ``drop_duplicates``, Glue_tranformation_json_parquet.py:186);
this is a brief-extension operator for the training-data pipeline, where
"keep one doc per near-dup cluster" is the actual deliverable of dedup.

Algorithm: min-label propagation. Every node starts labeled with its own
id; each round every node takes the min label over itself and its
neighbors; at fixpoint every component carries the min node id as its
cluster id. Rounds = graph diameter.

Scale notes (100 TB shape)
--------------------------
- Each round is ONE shuffle join (edges ⋈ labels on ``src``, both sides
  hash-partitioned on the same key) plus ONE hash aggregation — no
  all-pairs work, nothing driver-side except a 2-value convergence
  aggregate per round.
- ``localCheckpoint(eager=True)`` truncates lineage every round;
  without it the plan doubles per iteration and the optimizer chokes
  long before the data does.
- Convergence detection is O(1) driver data: labels only ever decrease,
  so ``(sum(lbl), count)`` is strictly decreasing until fixpoint —
  equality of consecutive rounds IS convergence (no expensive
  changed-rows anti-join).
- Near-dup graphs have tiny diameter (clusters are dense cliques-ish),
  so the round count stays single-digit. For adversarial path-shaped
  graphs, switch to alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14), which
  converges in O(log^2 n) — documented trade, not needed for dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MIN node id
    reachable from it. Returns ``(node, cluster_id)`` — one row per
    distinct node appearing in ``pairs``.

    ``max_iter`` bounds the rounds (≥ graph diameter needed for an exact
    answer; 25 covers any realistic dedup graph — a component would need
    diameter >25 to be cut short, and the convergence check stops early
    the round after fixpoint).
    """
    fwd = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    edges = fwd.union(
        pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    # Cache: re-joined every round. Pairs are already distinct per the
    # dedup contract; a defensive distinct would add a shuffle for nothing.
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )

    prev: tuple | None = None
    for _ in range(max_iter):
        # Propagate: each node offers its label to every neighbor, then
        # every node keeps the min of its own and all offered labels.
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
            break
        prev = cur
    return labels.select(F.col("node"), F.col("lbl").alias("cluster_id"))


def dup_clusters(
    verified_pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Near-dup cluster table from verified pairs: ``doc_id, cluster_id,
    cluster_size, is_keeper``. ``cluster_id`` is the min doc id of the
    component (deterministic canonical choice); the keeper is that doc.
    Singleton docs (no pair) are intentionally absent — they are their
    own keepers by definition and emitting them would turn a pair-sized
    result into a corpus-sized one."""
    cc = connected_components(verified_pairs, src_col, dst_col)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    # cluster_id join is a tiny-side broadcast at any scale where the
    # number of clusters ≪ corpus; let AQE decide rather than pinning.
    return cc.join(sizes, "cluster_id").select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        "cluster_size",
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    )
