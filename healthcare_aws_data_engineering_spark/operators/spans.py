"""Span-level exact deduplication — the n-gram-block approximation of
suffix-array substring dedup (Lee et al., "Deduplicating Training Data
Makes Language Models Better"), the pass that removes boilerplate
repeated ACROSS documents rather than whole-document duplicates.

Semantics: tokenize on single spaces, cut each document into
NON-overlapping ``span_tokens``-token blocks (the tail block may be
shorter), and keep only the globally FIRST occurrence of each distinct
block — "first" by ``(doc_id, span_idx)``, a total order. Surviving
blocks are reassembled in order into the deduplicated document.

Why non-overlapping blocks: overlapping-window removal makes the
reassembly ill-defined (dropping window i changes window i+1's text).
Block granularity trades recall (a duplicate phrase straddling a block
boundary survives) for an exact, order-independent, replayable result —
the same trade the MinHash pass makes at document granularity, one level
down.

Scale shape (100 TB): blocks are built INSIDE the row via
``transform(sequence(...))`` over the token array — no token-level
explode, no per-token shuffle. The plan is: projection → posexplode of
~n_tok/span_tokens blocks per doc → ONE shuffle keyed on the block
fingerprint (the keep-first window; md5 keys are uniform so no skew) →
ONE shuffle keyed on doc_id (the reassembly agg). Output rows are slim
(fingerprint + lengths, not the rebuilt text) so the result of a
100 TB run is manifest-sized; ``emit_text=True`` exists for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SPAN_TOKENS = 8


def span_dedup(
    docs: DataFrame,
    span_tokens: int = SPAN_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_text: bool = False,
) -> DataFrame:
    """Per-document result of corpus-wide span dedup: ``doc_id, n_spans,
    n_kept, dedup_len, dedup_fp`` (+ ``dedup_text`` when ``emit_text``).
    ``dedup_fp`` = md5 of the reassembled text ('' when every span of
    the doc was a repeat), so value-level correctness is checkable
    without shipping rebuilt corpora."""
    k = span_tokens
    # Deliberately split on a single space, NOT the shared \s+ tokenizer
    # (operators/text.py): spans are re-joined with ' ' to REBUILD the
    # deduplicated text, so the segmentation must round-trip the original
    # bytes exactly (same contract as operators/chunking.py).
    toks = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans).alias("span_idx", "span_text")
    )
    # Globally keep the first (doc_id, span_idx) occurrence of each span.
    w = Window.partitionBy(F.md5(F.col("span_text"))).orderBy(
        "doc_id", "span_idx"
    )
    kept = (
        exploded.withColumn("rn", F.row_number().over(w))
        .withColumn("keep", F.col("rn") == 1)
        .drop("rn")
    )
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("keep"),
                        F.struct(F.col("span_idx"), F.col("span_text")),
                    )
                )
            ),
            lambda s: s.span_text,
        ),
        " ",
    )
    out = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        rebuilt.alias("__txt"),
    )
    cols = [
        F.col("doc_id"),
        F.col("n_spans"),
        F.col("n_kept"),
        F.length("__txt").cast("long").alias("dedup_len"),
        F.md5(F.col("__txt")).alias("dedup_fp"),
    ]
    if emit_text:
        cols.append(F.col("__txt").alias("dedup_text"))
    return out.select(*cols)


def span_dedup_sql(
    table: str = "documents",
    span_tokens: int = SPAN_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: same blocks, same (doc_id, span_idx) keep-first
    order, same single-space reassembly."""
    k = span_tokens
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS l FROM {table}
),
tok AS (
  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i FROM t
),
sp AS (
  SELECT doc_id, (i - 1) // {k} AS span_idx,
         string_agg(w, ' ' ORDER BY i) AS span_text
  FROM tok GROUP BY doc_id, (i - 1) // {k}
),
flagged AS (
  SELECT doc_id, span_idx, span_text,
         ROW_NUMBER() OVER (PARTITION BY md5(span_text)
                            ORDER BY doc_id, span_idx) = 1 AS keep
  FROM sp
),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_spans,
         SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
         COALESCE(string_agg(CASE WHEN keep THEN span_text END, ' '
                             ORDER BY span_idx), '') AS txt
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(length(txt) AS BIGINT) AS dedup_len,
       md5(txt) AS dedup_fp
FROM agg
"""
