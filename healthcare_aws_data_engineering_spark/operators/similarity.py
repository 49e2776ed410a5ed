"""Similarity search over an embedding column (array<float>).

Extensions beyond the reference (SURVEY §7.2 step 7):

- :func:`cosine_topk` — brute-force exact top-k (the correctness baseline).
- :func:`lsh_topk`   — random-hyperplane LSH bucketed approximate top-k
  (the scale path: candidates restricted to matching signature buckets).
- :func:`embedding_near_dup` — near-duplicate pairs by cosine threshold,
  LSH-bucketed.

Scale design:
- dot products / norms are native array expressions (zip_with + aggregate)
  inside whole-stage codegen — no Python, no explode;
- brute force is queries × corpus: right for reranking or tiny query sets;
  the LSH variant turns the cross join into an equi-join on bucket ids
  (shuffle carries (bucket, id, vec));
- hyperplanes are generated DETERMINISTICALLY from xxhash64(plane, dim) so
  executors need no broadcast state and results are reproducible;
- exact-sum mode (``exact=True``) accumulates the dot product in DECIMAL —
  order-independent, used by the DuckDB oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_DEC = "decimal(28,12)"


def _pairwise_sum(a: Column, b: Column, exact: bool) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    if exact:
        acc = F.aggregate(
            prods,
            F.lit(0).cast(_DEC),
            lambda s, x: (s + x.cast(_DEC)).cast(_DEC),
        )
        return acc.cast("double")
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def dot(a: Column, b: Column, exact: bool = False) -> Column:
    return _pairwise_sum(a, b, exact)


def norm(a: Column, exact: bool = False) -> Column:
    return F.sqrt(_pairwise_sum(a, a, exact))


def cosine(a: Column, b: Column, exact: bool = False) -> Column:
    return dot(a, b, exact) / (norm(a, exact) * norm(b, exact))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (excluding self).

    queries is expected to be small → broadcast; corpus streams through one
    pass computing Q cosines per row; per-query top-k via window over the
    (rank-filtered) candidates. Deterministic tiebreak on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = cosine(F.col("q_vec"), F.col("c_vec"), exact)
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(vec: Column, planes: int = 16) -> Column:
    """Sign-bit signature against ``planes`` pseudo-random hyperplanes.
    Plane p's component for dimension i is derived from xxhash64(p, i) —
    deterministic, stateless, identical on every executor."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)

    def plane_component(p: int, i: Column) -> Column:
        h = F.xxhash64(F.lit(p), i.cast("long"))
        return (F.pmod(h, F.lit(2000001)).cast("double") - 1000000.0) / 1000000.0

    # NB: unary closures only — a two-parameter lambda is F.transform's
    # (element, index) form and would silently rebind p to the array index.
    def _components(p: int):
        return lambda i: plane_component(p, i)

    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(dims, _components(p)),
                    lambda x, r: x.cast("double") * r,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long"))
        for p in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 signature
    band with the query, then exact cosine rerank within candidates.

    The cross join of :func:`cosine_topk` becomes an equi-join on
    (band, band_key): at 1000-executor scale the corpus is hash-partitioned
    by bucket and each query probes only its buckets."""
    width = planes // bands

    def banded(df: DataFrame, role: str) -> DataFrame:
        # stage the signature as a real column: the band projections below
        # reference it `bands` times, and inlining would recompute the
        # whole planes x dims aggregate per band.
        staged = df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_vec"),
            hyperplane_signature(F.col(vec_col), planes).alias("__sig"),
        )
        return staged.select(
            f"{role}_id",
            f"{role}_vec",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("__sig"), b * width).bitwiseAND(
                            (1 << width) - 1
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "band_key"),
        )
    cq = banded(queries, "query")
    cc = banded(corpus, "neighbor")
    cands = (
        cq.join(cc, ["band", "band_key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "query_vec", "neighbor_id", "neighbor_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine(F.col("query_vec"), F.col("neighbor_vec"))
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _cell_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of squared distances to each centroid — ONE transform
    over a nested literal centroid array, so the zip/aggregate machinery
    appears once in the tree instead of once per centroid (compile-time
    matters: 16 copies of it pushed IVF plan construction to ~10s)."""
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    return F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(
                vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
    )


def _centroid_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin-distance cell id (first match on ties → deterministic)."""
    darr = _cell_dists(vec, centroids)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus vectors are assigned to coarse
    cells (argmin distance to centroids), each query probes only its
    ``n_probe`` nearest cells, and candidates are exactly reranked.

    Centroids here are a deterministic sample of the corpus (first
    ``n_centroids`` by id) rather than trained k-means — the INDEX
    STRUCTURE and query path are the real thing; swap in
    ``pyspark.ml.clustering.KMeans`` centers for trained cells.

    Scale shape: assignment is a projection against broadcast-literal
    centroids (no shuffle); the probe join is an equi-join on cell id, so
    a query touches ~n_probe/n_centroids of the corpus instead of all of
    it; rerank cost is |candidates| dot products."""
    cents = [
        [float(x) for x in r[1]]
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    ]
    c_cells = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("neighbor_vec"),
        _centroid_cell(F.col(vec_col), cents).alias("cell"),
    )
    # per-query: n_probe nearest cells, exploded to probe rows
    qdists = _cell_dists(F.col("query_vec"), cents)
    indexed = F.zip_with(
        qdists,
        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
        lambda d, i: F.struct(d.alias("d"), i.cast("int").alias("cell")),
    )
    ranked_cells = F.slice(
        F.transform(F.array_sort(indexed), lambda s: s["cell"]), 1, n_probe
    )
    q_probe = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
            ranked_cells.alias("__cells"),
        )
        .select(
            "query_id", "query_vec", F.explode("__cells").alias("cell")
        )
    )
    cands = (
        q_probe.join(c_cells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    sim = cosine(F.col("query_vec"), F.col("neighbor_vec"))
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-bucketed: pair
    fan-out happens only inside signature buckets (size-capped)."""
    width = planes // bands
    staged = corpus.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("__sig"),
    )
    banded = staged.select(
        "doc",
        "vec",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), b * width).bitwiseAND(
                        (1 << width) - 1
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    # Bucket self-equi-join (see dedup.minhash_lsh_pairs for why not nested
    # array lambdas and why the cap is a window, not a groupBy branch).
    from .dedup import _bucket_cap

    capped = _bucket_cap(banded, "band_key", max_bucket).select(
        "band", "band_key", "doc", "vec"
    )
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
