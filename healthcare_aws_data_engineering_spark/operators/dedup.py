"""Deduplication operators for large-scale training-data pipelines.

Extensions beyond the reference (SURVEY §7.2 step 7). Five families:

- :func:`exact_dedup` — hash-groupBy on the (normalized) content hash.
- :func:`minhash_signature` / :func:`minhash_lsh_pairs` — MinHash + banded
  LSH candidate generation (shingle → K min-hashes → band → bucket join).
- :func:`simhash_signature` / :func:`simhash_pairs` — 64-bit SimHash with
  Hamming-ball candidate matching via band exactness.
- :func:`ngram_jaccard` — exact word-n-gram Jaccard verification on
  candidate pairs.
- embedding-cosine near-dup lives in :mod:`.similarity` (same bucketing).

Scale design notes (the point of these operators):

- Everything before the candidate join is a PROJECTION (array functions
  over each row — no explode, no shuffle); signatures are computed fused
  with the scan.
- The only shuffles are (a) groupBy(band_hash) — each doc emits B rows, so
  shuffle volume is B×docs small fixed-width rows, not text; (b) the
  verification join, which touches only candidate pairs.
- Bucket skew (a degenerate band bucket with millions of docs) is the real
  100 TB hazard: ``max_bucket`` caps pair fan-out per bucket; AQE skew-join
  handles the joins.
- Two hash backends: ``xxhash64`` (JVM codegen, the production path) and
  ``md5`` (slower; exists in every engine — used by the DuckDB oracle
  harness so the whole LSH pipeline is cross-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalize_text


# ----------------------------------------------------------------- exact --
def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
    max_ids: int = 100,
) -> DataFrame:
    """Exact duplicate groups: md5 of (normalized) text → min id kept.
    Output: one row per duplicate GROUP (dup_count ≥ 2) with the keeper id.
    Single hash aggregate; map-side partial agg keeps shuffle tiny.

    ``doc_ids`` is a bounded SAMPLE of the group capped at ``max_ids``
    members (the ``max_ids`` smallest ids, so deterministic): a degenerate
    group — millions of empty/boilerplate docs hashing identically after
    normalization — must not materialize one unbounded array row at
    100 TB. The cap is applied BEFORE collect_list (row_number over the
    same hash partitioning the groupBy needs, so one exchange total) —
    slicing after a full collect_list would still buffer the whole group.
    ``dup_count`` is always the exact group size (window count over the
    uncapped partition); pass ``max_ids=0`` to drop the id list and the
    window entirely, leaving the pure single-hash-agg scale path."""
    from pyspark.sql import Window as W

    t = F.col(text_col)
    h = F.md5((normalize_text(t) if normalized else t).cast("binary"))
    if max_ids <= 0:
        return (
            docs.groupBy(h.alias("content_hash"))
            .agg(
                F.min(F.col(id_col)).alias("keep_id"),
                F.count(F.lit(1)).alias("dup_count"),
            )
            .filter(F.col("dup_count") >= 2)
        )
    base = docs.select(h.alias("content_hash"), F.col(id_col).alias("__id"))
    wp = W.partitionBy("content_hash")
    ranked = base.withColumn(
        "__rn", F.row_number().over(wp.orderBy("__id"))
    ).withColumn("__cnt", F.count(F.lit(1)).over(wp))
    return (
        ranked.filter(F.col("__rn") <= max_ids)
        .groupBy("content_hash")
        .agg(
            F.min("__id").alias("keep_id"),
            F.first("__cnt").alias("dup_count"),
            F.sort_array(F.collect_list("__id")).alias("doc_ids"),
        )
        .filter(F.col("dup_count") >= 2)
    )


# --------------------------------------------------------------- shingles --
def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (projection only).

    The word array is bound as a LAMBDA VARIABLE (transform over a
    one-element array wrapper) so the split evaluates once per row, and
    the grams index into that variable — a cheap attribute reference.
    (A transform whose lambda body calls ``element_at(ws, i+j)`` on the
    raw split COLUMN inlines the whole split expression per element —
    O(words²) per document, ~10x slower; the r15 measurement also
    retired the earlier zip_with-fold form, which allocated two slices
    plus two zipped arrays per row and benched ~1.5x slower than this
    index form at identical output.)"""
    ws = F.split(F.trim(text), r"\s+")

    def inner(arr: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(arr) - n)
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(arr, i + j + 1) for j in range(n)]
        )
        return F.array_distinct(
            F.when(F.size(arr) >= n, F.transform(idx, gram)).otherwise(
                F.array(F.concat_ws(" ", arr))
            )
        )

    return F.element_at(F.transform(F.array(ws), inner), 1)


def _bucket_cap(
    banded: DataFrame, key_col: str, max_bucket: int, min_bucket: int = 2
) -> DataFrame:
    """Keep rows whose (band, key) bucket has min_bucket..max_bucket
    members, via a window count over the bucket shuffle (single subtree —
    see callers). The default ``min_bucket=2`` is a SELF-join
    optimization (a singleton bucket cannot produce a within-corpus
    pair); probe-against-index callers (``streaming.near_dup_stream``)
    must pass ``min_bucket=1`` — there a stream doc legitimately matches
    an index doc that is alone in its bucket."""
    from pyspark.sql import Window as W

    w = W.partitionBy("band", key_col)
    return banded.withColumn("__n", F.count(F.lit(1)).over(w)).filter(
        (F.col("__n") >= min_bucket) & (F.col("__n") <= max_bucket)
    )


# ---------------------------------------------------------------- minhash --
def _shingle_hash(shingle: Column, perm: int, backend: str) -> Column:
    if backend == "xxhash64":
        return F.xxhash64(shingle, F.lit(perm))
    if backend == "md5":
        # hex strings compare lexicographically — min() works unchanged and
        # is reproducible in any engine with md5().
        return F.md5(F.concat(shingle, F.lit(f"#{perm}")).cast("binary"))
    raise ValueError(f"unknown hash backend: {backend}")


def minhash_signature(
    text: Column, num_perm: int = 8, backend: str = "xxhash64"
) -> Column:
    """Array of ``num_perm`` min-hashes over the word-3-gram shingles.
    Pure projection: transform + array_min per permutation."""
    sh = word_shingles(text)

    # NB: the per-permutation closure must be UNARY — a two-parameter
    # lambda (e.g. ``lambda s, p=p``) is treated by F.transform as the
    # (element, index) form, silently rebinding p to the array index.
    def _hasher(p: int):
        return lambda s: _shingle_hash(s, p, backend)

    return F.array(
        *[
            F.array_min(F.transform(sh, _hasher(p)))
            for p in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    backend: str = "xxhash64",
    max_bucket: int = 50,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    ``num_perm`` minhashes split into ``bands`` bands of ``num_perm/bands``
    rows; docs sharing ANY band hash become a candidate pair. Probability a
    pair with Jaccard j collides: 1-(1-j^r)^b.

    Physical plan: projection (signature) → explode to B rows/doc →
    groupBy(band_idx, band_hash) with a size cap → pair fan-out inside each
    bucket → distinct. Shuffle carries only (band_hash, id)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    # Signature via explode + partial-agg min: each shingle is hashed ONCE
    # per permutation and map-side combine reduces to num_perm mins per doc
    # before the (doc_id-keyed, fixed-width) shuffle. The projection-only
    # form (minhash_signature) re-evaluates the whole shingle array per
    # permutation in interpreted HOF eval — fine for one-off column use,
    # ~10x slower as the pipeline backbone.
    shingled = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col))).alias("__s"),
    )
    sig_tbl = shingled.groupBy("doc").agg(
        *[
            F.min(_shingle_hash(F.col("__s"), p, backend)).alias(f"__h{p}")
            for p in range(num_perm)
        ]
    )
    banded = sig_tbl.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"__h{b * r + i}").cast("string")
                                for i in range(r)
                            ],
                        ).cast("binary")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # Pair fan-out = bucket self-equi-join (size-capped buckets only).
    # NOTE: an earlier version built pairs with nested transform/filter
    # over collect_list'd buckets; nested index-capturing lambdas proved
    # non-deterministic under local[32] (codegen lambda-variable races), and
    # the join is the shape that scales anyway (AQE handles bucket skew).
    #
    # The size cap is a WINDOW count over the same (band, band_hash)
    # shuffle, not a separate groupBy branch: both self-join inputs are
    # then the identical subtree, so the signature pipeline is computed
    # once and its exchange is reused (a groupBy-sizes + join shape
    # compiled to THREE independent recomputations of the signatures).
    capped = _bucket_cap(banded, "band_hash", max_bucket).select(
        "band", "band_hash", "doc"
    )
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
    )
    return pairs.distinct()


# ---------------------------------------------------------------- simhash --
def simhash_votes(text: Column, bits: int = 64) -> Column:
    """Per-bit ±1 vote totals (array<int>) over the word shingles — the
    expensive half of SimHash, kept as its own projection so the cheap
    bit-packing half can reference it ``bits`` times without Catalyst
    duplicating this aggregate."""
    sh = word_shingles(text)
    return F.aggregate(
        sh,
        F.array_repeat(F.lit(0), bits),
        lambda acc, s: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(s), i).bitwiseAND(1) == 1, 1
                    ).otherwise(-1)
                    for i in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )


def simhash_from_votes(votes: Column, bits: int = 64) -> Column:
    """Pack the sign of each vote into a 64-bit long.

    References ``votes`` exactly ONCE (zip_with positions, OR-fold) so the
    votes aggregate is never duplicated in the expression tree — inlining
    it per-bit blows the tree up 64x and OOMs codegen."""
    def signed64(i: int) -> int:
        v = 1 << i
        return v - (1 << 64) if v >= (1 << 63) else v

    masks = F.array(*[F.lit(signed64(i)).cast("long") for i in range(bits)])
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_signature(text: Column, bits: int = 64) -> Column:
    """SimHash over word shingles: per-bit ±1 votes from each shingle's
    xxhash64, sign of the sum becomes the bit. Projection-only: the per-doc
    bit vector is built with array transform/aggregate, no explode.

    NOTE: inlines the votes aggregate ``bits`` times — fine for tests and
    small selects; the distributed path (:func:`simhash_pairs`) uses the
    two-step votes→pack projection instead."""
    return simhash_from_votes(simhash_votes(text, bits), bits)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_hamming: int = 6,
    max_bucket: int = 50,
    backend: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates whose SimHashes agree on at least one of
    ``bands`` equal-width bands (guarantees recall for Hamming ≤ bands-1 by
    pigeonhole), verified with an exact Hamming threshold.

    ``backend``: per-shingle bit-vote source.

    - ``"xxhash64"`` (default, 64-bit): bit i of xxhash64(shingle) —
      cheapest, engine-specific (rows-only correctness check).
    - ``"md5digit"`` (32-bit): bits = the first 8 hex digits of
      md5(shingle) parsed as a 32-bit integer (Spark ``conv(_,16,10)``,
      DuckDB ``('0x'||substr)::BIGINT``) — one md5 + one parse per
      shingle, then the same cheap shiftright votes as the xxhash64
      path; reproducible in any engine with md5(), so the DuckDB oracle
      replays the full pipeline. (An earlier form compared each hex
      digit with substr — 32 string ops per shingle, ~25% slower.)
    """
    bits = 64 if backend == "xxhash64" else 32
    width = bits // bands
    # Explode + partial-agg bit votes: each shingle is hashed ONCE and
    # the per-bit ±1 sums combine map-side; the shuffle carries one
    # fixed-width row per doc. (The projection-only simhash_votes form is
    # interpreted HOF eval — kept for column-level use, too slow here.)
    exploded = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col))).alias("__s"),
    )
    if backend == "xxhash64":
        h = F.xxhash64(F.col("__s"))
        vote = [
            F.when(F.shiftright(h, i).bitwiseAND(1) == 1, 1).otherwise(-1)
            for i in range(bits)
        ]
    elif backend == "md5digit":
        exploded = exploded.select(
            "doc",
            F.conv(
                F.substring(F.md5(F.col("__s").cast("binary")), 1, 8), 16, 10
            )
            .cast("long")
            .alias("__s"),
        )
        h = F.col("__s")
        vote = [
            F.when(F.shiftright(h, i).bitwiseAND(1) == 1, 1).otherwise(-1)
            for i in range(bits)
        ]
    else:
        raise ValueError(f"unknown simhash backend: {backend}")
    votes = exploded.groupBy("doc").agg(
        *[F.sum(vote[i]).alias(f"__v{i}") for i in range(bits)]
    )
    packed = F.lit(0).cast("long")
    for i in range(bits):
        packed = packed.bitwiseOR(
            F.when(
                F.col(f"__v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    sig = votes.select("doc", packed.alias("sim"))
    banded = sig.select(
        "doc",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sim"), b * width)
                    .bitwiseAND((1 << width) - 1)
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    # Bucket self-equi-join (see minhash_lsh_pairs for why not nested
    # array lambdas and why the cap is a window, not a groupBy branch).
    capped = _bucket_cap(banded, "band_key", max_bucket).select(
        "band", "band_key", "doc", "sim"
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
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()


# ---------------------------------------------------------------- jaccard --
def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate (doc_a, doc_b) pairs —
    the verification stage after LSH. Joins the raw TEXT to the pairs
    (two broadcast-able hash joins at candidate scale) and shingles only
    the matched rows; set math is native array_intersect/array_union.

    Candidates-only shingling (r16): the prior form joined per-doc
    shingle ARRAYS to the pairs, which computed the word_shingles
    projection over the ENTIRE corpus once per join leg — two full
    corpus passes to verify a pair set that touches a fraction of the
    docs (the inner join discards the rest unread). Shingling after the
    join costs work proportional to the PAIR list instead (a doc in m
    pairs shingles m times — pair lists are corpus-fraction-sized even
    at web-crawl dup rates, so candidates ≪ corpus at any scale).
    Shingle arrays are staged as real columns so intersect/union read
    attributes, not re-evaluated subtrees."""
    a = docs.select(
        F.col(id_col).alias("doc_a"), F.col(text_col).alias("__ta")
    )
    b = docs.select(
        F.col(id_col).alias("doc_b"), F.col(text_col).alias("__tb")
    )
    staged = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            word_shingles(F.col("__ta"), n).alias("sh_a"),
            word_shingles(F.col("__tb"), n).alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return staged.select(
        "doc_a",
        "doc_b",
        inter.alias("n_intersect"),
        union.alias("n_union"),
        (inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")).alias(
            "jaccard"
        ),
    )
