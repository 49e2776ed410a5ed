"""Deterministic distinct-count sketch — k-permutation min-hash
(KMV-style) cardinality estimation.

Why not HLL: Spark's ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_count_distinct`` (HLL) are different algorithms with different
internal hashing, so their estimates can never hash-match across
engines. This sketch is built from md5 — the one hash both engines
share — so the ESTIMATE ITSELF is bit-identical in any engine and the
driver's value-hash oracle can check it like any exact query.

Estimator: for permutation ``i`` (0..k-1), hash each value to a uniform
``u_i = int(md5(v || '#i')[:8], 16) / 2^32`` in [0,1) and keep the
per-group minimum ``m_i``. The minimum of ``n`` uniforms has mean
``1/(n+1)``, so ``Σ m_i ≈ k/(n+1)`` and ``n̂ = k/Σm_i − 1``
(method-of-moments; relative error ~1/√k).

Scale shape: each ``min`` combines MAP-SIDE — the shuffle carries one
fixed-width row of k doubles per group, versus exact COUNT(DISTINCT)'s
Expand + two-phase shuffle of every distinct value. Determinism: each
``m_i`` is an order-insensitive scalar; the estimate sums k COLUMNS in
a fixed expression order (not row order), so both engines compute the
identical double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SKETCH_K = 32


def uniform_hash(value: Column, perm: int) -> Column:
    """md5-derived uniform [0,1) for permutation ``perm`` — the same
    recipe the SQL oracle replays (`('0x'||substr(md5(..),1,8))::BIGINT`)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(value, F.lit(f"#{perm}")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(float(2**32))


def distinct_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = SKETCH_K,
    include_exact: bool = False,
) -> DataFrame:
    """Per-group estimated distinct count of ``value_col`` (the k
    min-hash sketch internals folded away). Returns ``group_col,
    est_distinct`` (double), plus ``exact_distinct`` when
    ``include_exact`` (for error-bound checks — at real scale you run
    the sketch INSTEAD of the exact distinct, that being the point)."""
    v = F.col(value_col).cast("string")
    aggs = [F.min(uniform_hash(v, i)).alias(f"__m{i}") for i in range(k)]
    if include_exact:
        aggs = [F.count_distinct(F.col(value_col)).alias("exact_distinct")] + aggs
    agg = df.groupBy(group_col).agg(*aggs)
    total = None
    for i in range(k):
        total = F.col(f"__m{i}") if total is None else total + F.col(f"__m{i}")
    est = (F.lit(float(k)) / total) - 1.0
    keep = [group_col] + (["exact_distinct"] if include_exact else [])
    return agg.select(*keep, est.alias("est_distinct"))


def sketch_sql(table: str, group_col: str, value_col: str, k: int = SKETCH_K) -> str:
    """DuckDB twin: the same k mins and the same fixed-order sum."""
    # every literal is CAST to DOUBLE: a bare `4294967296.0` is a DECIMAL
    # literal in DuckDB, which would switch the division to decimal
    # arithmetic and break bit-parity with Spark's double math.
    mins = ",\n    ".join(
        f"MIN(CAST(CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR) || '#{i}'), 1, 8)) "
        f"AS BIGINT) AS DOUBLE) / CAST(4294967296 AS DOUBLE)) AS __m{i}"
        for i in range(k)
    )
    total = " + ".join(f"__m{i}" for i in range(k))
    return f"""
WITH s AS (
  SELECT {group_col},
    {mins}
  FROM {table} GROUP BY {group_col}
)
SELECT {group_col},
  (CAST({k} AS DOUBLE) / ({total})) - CAST(1 AS DOUBLE) AS est_distinct
FROM s
"""
