"""Round-3 corpus-pipeline driver queries (brief extensions; no
reference counterpart): span-level substring dedup, overlapping
context-window chunking, temperature-based source mixing, cross-source
contamination overlap, JSON property extraction, and count-min-sketch
heavy hitters.

Every query emits only BIGINT / VARCHAR / exact-double cells and has a
DuckDB oracle twin generated from the same constants, so thresholds and
hash families can never drift between the engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.chunking import CHUNK_STRIDE, CHUNK_WINDOW, chunk_documents, chunk_sql
from ..operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_heavy_hitters, cms_sql
from ..operators.spans import SPAN_TOKENS, span_dedup, span_dedup_sql
from ..sources.tables import load_table

# ------------------------------------------------------------- span_dedup --


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_dedup(load_table(spark, sf_dir, "documents"), SPAN_TOKENS)


# -------------------------------------------------------------- doc_chunks --


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), CHUNK_WINDOW, CHUNK_STRIDE
    )


# ------------------------------------------------------------- mix_weights --
# Temperature-based source mixing (the data-mixture step of LLM
# training): sample source i proportionally to (token count)^alpha.
# alpha = 0.5 — i.e. sqrt — on purpose: IEEE-754 sqrt is CORRECTLY
# ROUNDED in both the JVM and DuckDB, while pow(x, 0.7) is libm-
# dependent, so sqrt is the one exponent whose weights replay
# bit-identically across engines. Weights are snapped to a 1e-6 integer
# grid BEFORE normalization so the sum is exact BIGINT addition
# (order-free), and the per-source share is one double divide + round
# on identical operands. Scale shape: one map-side-combining hash agg
# by source (sources are bounded), broadcast total — nothing else.
MIX_EPOCH_DOCS = 100_000


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = (
        docs.select(
            "source", F.size(F.split(F.col("text"), " ")).cast("long").alias("__t")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
        )
        .withColumn(
            "weight_u6",
            F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1e6).cast("long"),
        )
    )
    total = per_source.agg(F.sum("weight_u6").alias("__total"))
    return (
        per_source.crossJoin(F.broadcast(total))
        .withColumn(
            "share_e6",
            F.round(
                F.lit(1e6)
                * (
                    F.col("weight_u6").cast("double")
                    / F.col("__total").cast("double")
                )
            ).cast("long"),
        )
        .withColumn(
            "docs_per_epoch",
            F.expr(f"CAST(({MIX_EPOCH_DOCS} * share_e6) DIV 1000000 AS BIGINT)"),
        )
        .select("source", "n_docs", "n_tokens", "weight_u6", "share_e6", "docs_per_epoch")
    )


_MIX_WEIGHTS_SQL = f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS weight_u6
  FROM per_source
),
t AS (SELECT SUM(weight_u6) AS total FROM w)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens, weight_u6,
       CAST(round(CAST(1000000 AS DOUBLE)
            * (CAST(weight_u6 AS DOUBLE) / CAST(total AS DOUBLE))) AS BIGINT) AS share_e6,
       CAST(({MIX_EPOCH_DOCS} * CAST(round(CAST(1000000 AS DOUBLE)
            * (CAST(weight_u6 AS DOUBLE) / CAST(total AS DOUBLE))) AS BIGINT)) // 1000000
            AS BIGINT) AS docs_per_epoch
FROM w, t
"""


# ---------------------------------------------------------- source_overlap --
# Cross-source contamination audit: how many documents share a leading-
# 16-token fingerprint across each pair of sources. Prefix fingerprints
# (not whole-text md5) are the standard cheap key for "same boilerplate
# ingested twice under different feeds". Scale shape: DISTINCT (fp,
# source) is one shuffle on slim rows; the self-join keys on fp whose
# per-key cardinality is bounded by the source count, so no bucket can
# explode past |sources|² pairs.
OVERLAP_PREFIX_TOKENS = 16


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, OVERLAP_PREFIX_TOKENS), " "
        )
    )
    fps = docs.select(fp.alias("fp"), "source").distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


_SOURCE_OVERLAP_SQL = f"""
WITH fps AS (
  SELECT DISTINCT
    md5(array_to_string(list_slice(string_split(text, ' '), 1, {OVERLAP_PREFIX_TOKENS}), ' ')) AS fp,
    source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


# -------------------------------------------------------------- json_props --
# Semi-structured property extraction: events carry a JSON `props`
# payload; pull a typed field out and aggregate per event_type. The
# Spark side uses get_json_object (JVM-side JSON path, no UDF); at
# 100 TB this is a pure projection + one bounded-key hash agg.


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("__k").alias("n_with_k"),
            F.sum("__k").alias("sum_k"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
        )
    )


_JSON_PROPS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM e GROUP BY event_type
"""


# ----------------------------------------------------------- heavy_hitters --
CMS_TOP_K = 40


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    return cms_heavy_hitters(words, "w", top_k=CMS_TOP_K)


_HEAVY_HITTERS_SQL = cms_sql(
    "SELECT unnest(string_split(text, ' ')) AS w FROM documents",
    "w",
    top_k=CMS_TOP_K,
)


CORPUS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "span_dedup": q_span_dedup,
    "doc_chunks": q_doc_chunks,
    "mix_weights": q_mix_weights,
    "source_overlap": q_source_overlap,
    "json_props": q_json_props,
    "heavy_hitters": q_heavy_hitters,
}

CORPUS_ORACLE: dict[str, str] = {
    "span_dedup": span_dedup_sql(),
    "doc_chunks": chunk_sql(),
    "mix_weights": _MIX_WEIGHTS_SQL,
    "source_overlap": _SOURCE_OVERLAP_SQL,
    "json_props": _JSON_PROPS_SQL,
    "heavy_hitters": _HEAVY_HITTERS_SQL,
}
