"""Corpus-curation driver queries: decontamination, BM25 retrieval,
repetition filtering, incremental batch admission, and deterministic
shard export (brief extensions; no reference counterpart).

Each query has a DuckDB oracle twin built from the same constants, so
thresholds/terms can never drift between the engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.decontam import decontaminate, decontaminate_sql
from ..operators.ingest import (
    incremental_dedup,
    incremental_dedup_sql,
    shard_manifest,
    shard_manifest_sql,
)
from ..operators.retrieval import bm25_sql, bm25_topk
from ..operators.text import repetition_stats
from ..sources.tables import load_table

# Query terms: three common words + one rare ('dup' ~ 3% of the doc-freq
# of the common terms) so the idf spread actually exercises the BM25 math.
BM25_TERMS = ["spark", "vector", "stream", "dup"]
BM25_K = 25


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(load_table(spark, sf_dir, "documents"))


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, sf_dir, "documents"), BM25_TERMS, k=BM25_K)


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_dedup(load_table(spark, sf_dir, "documents"))


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_manifest(load_table(spark, sf_dir, "documents"))


_REPETITION_SQL = """
WITH
  w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
  tok AS (
    SELECT doc_id, ws[i] AS w
    FROM w, unnest(generate_series(1, len(ws))) AS t(i)
  ),
  wc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
  a1 AS (
    SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd, MAX(c) AS topw
    FROM wc GROUP BY doc_id
  ),
  big AS (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    WHERE len(ws) >= 2
  ),
  bc AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY doc_id, g),
  a2 AS (SELECT doc_id, SUM(c) AS nb, MAX(c) AS topb FROM bc GROUP BY doc_id)
SELECT a1.doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(nd AS BIGINT) AS n_distinct,
       CAST(round(nd / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS distinct_ratio,
       CAST(round(topw / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS top_word_frac,
       CAST(round(COALESCE(topb / CAST(nb AS DOUBLE), 0.0), 6) AS DECIMAL(18,6))
         AS top_bigram_frac,
       (topw / CAST(n AS DOUBLE) > {topw_max}
        OR COALESCE(topb / CAST(nb AS DOUBLE), 0.0) > {topb_max}
        OR nd / CAST(n AS DOUBLE) < {nd_min}) AS repetitive
FROM a1 LEFT JOIN a2 USING (doc_id)
"""


def _repetition_sql() -> str:
    from ..operators.text import (
        DISTINCT_RATIO_MIN,
        TOP_BIGRAM_FRAC_MAX,
        TOP_WORD_FRAC_MAX,
    )

    return _REPETITION_SQL.format(
        topw_max=TOP_WORD_FRAC_MAX,
        topb_max=TOP_BIGRAM_FRAC_MAX,
        nd_min=DISTINCT_RATIO_MIN,
    )


CURATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "decontaminate": q_decontaminate,
    "bm25_search": q_bm25_search,
    "repetition_filter": q_repetition_filter,
    "incremental_dedup": q_incremental_dedup,
    "shard_manifest": q_shard_manifest,
}

CURATION_ORACLE: dict[str, str] = {
    "decontaminate": decontaminate_sql("documents"),
    "bm25_search": bm25_sql("documents", BM25_TERMS, k=BM25_K),
    "repetition_filter": _repetition_sql(),
    "incremental_dedup": incremental_dedup_sql("documents"),
    "shard_manifest": shard_manifest_sql("documents"),
}
