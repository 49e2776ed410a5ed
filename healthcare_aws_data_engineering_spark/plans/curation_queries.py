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


# --------------------------------------------------------------- lm_score --
LM_THRESHOLD = -3.42  # mean token logprob below this → 'surprising' doc


def lm_score(
    docs: DataFrame,
    threshold: float = LM_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram LM quality score (the CCNet-style statistical filter,
    reduced to its order-0 core): per document, the mean token
    log-probability under the corpus's own unigram distribution; docs far
    below the corpus norm are gibberish/outliers (``lm_flag``).

    Cross-engine determinism: each word's logprob is ONE ln of an
    identical rational (count/total) rounded to the DECIMAL(18,6) grid,
    and the per-doc sum is exact decimal addition — order-free, so the
    mean is bit-identical in DuckDB.

    Scale shape: the vocabulary aggregation is one hash agg whose output
    is language-sized (bounded) → BROADCAST back; the per-doc mean is one
    map-side-combining agg by ``doc_id`` (tokens of a doc never leave
    their split). Nothing corpus-sized shuffles.
    """
    from pyspark.sql import functions as F2

    toks = docs.select(
        F2.col(id_col).alias("doc_id"),
        F2.explode(F2.split(F2.trim(F2.col(text_col)), r"\s+")).alias("w"),
    )
    vocab = toks.groupBy("w").agg(F2.count(F2.lit(1)).alias("c"))
    total = vocab.agg(F2.sum("c").alias("n"))
    lp = vocab.crossJoin(F2.broadcast(total)).select(
        "w",
        F2.log(F2.col("c") / F2.col("n").cast("double"))
        .cast("decimal(18,6)")
        .alias("lpd"),
    )
    per = (
        toks.join(F2.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(F2.sum("lpd").alias("s"), F2.count(F2.lit(1)).alias("n_tokens"))
    )
    mean = F2.col("s").cast("double") / F2.col("n_tokens")
    return per.select(
        "doc_id",
        "n_tokens",
        F2.round(mean, 6).cast("decimal(18,6)").alias("mean_logprob"),
        (mean < threshold).alias("lm_flag"),
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_score(load_table(spark, sf_dir, "documents"))


_LM_SCORE_SQL = f"""
WITH
  w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
  tok AS (
    SELECT doc_id, ws[i] AS w
    FROM w, unnest(generate_series(1, len(ws))) AS t(i)
  ),
  vocab AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
  tot AS (SELECT SUM(c) AS n FROM vocab),
  lp AS (
    SELECT w, CAST(ln(c / CAST((SELECT n FROM tot) AS DOUBLE))
                   AS DECIMAL(18,6)) AS lpd
    FROM vocab
  ),
  per AS (
    SELECT doc_id, SUM(lpd) AS s, COUNT(*) AS n_tokens
    FROM tok JOIN lp USING (w) GROUP BY doc_id
  )
SELECT doc_id, n_tokens,
       CAST(round(CAST(s AS DOUBLE) / n_tokens, 6) AS DECIMAL(18,6))
         AS mean_logprob,
       CAST(s AS DOUBLE) / n_tokens < {LM_THRESHOLD} AS lm_flag
FROM per
"""


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
    "lm_score": q_lm_score,
}

CURATION_ORACLE: dict[str, str] = {
    "decontaminate": decontaminate_sql("documents"),
    "bm25_search": bm25_sql("documents", BM25_TERMS, k=BM25_K),
    "repetition_filter": _repetition_sql(),
    "incremental_dedup": incremental_dedup_sql("documents"),
    "shard_manifest": shard_manifest_sql("documents"),
    "lm_score": _LM_SCORE_SQL,
}
