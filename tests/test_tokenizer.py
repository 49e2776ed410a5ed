"""The ONE shared tokenizer (operators/text.py tokens()/token_count() and
their DuckDB twins tokens_sql()/token_count_sql()) — the r6 verdict's
"unify the tokenizer" ask.

Three layers:
1. tokens()/token_count() match Python's str.split() (which IS trim+\\s+)
   on tab / double-space / leading-trailing / empty fixtures;
2. the DuckDB twins produce the same token streams and counts on the
   same fixtures (the engine-parity half);
3. the previously single-space corpus queries (mix_weights, word_bigrams,
   dataset_card, shard_manifest) now agree Spark-vs-DuckDB on a corpus
   that CONTAINS tabs, double spaces and an empty document — exactly the
   inputs where the old split(' ') and the \\s+ tokenizer diverged.

The deliberate space-exact exceptions (chunking/spans, which re-join
tokens to reconstruct text byte-exactly) are pinned reversible here so
the exception stays honest.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators.text import (
    token_count,
    token_count_sql,
    tokens,
    tokens_sql,
)

# The whitespace gauntlet: every shape that distinguishes split(' ')
# from trim+\s+, PLUS the engine-divergence probes — vertical tab \x0B
# is in Java's \s but NOT in RE2's (the reason oracles spell the class
# out, operators/text.py::WORD_SPLIT_RE_SQL), and \x1c / nbsp are
# whitespace to Python but to NEITHER regex engine.
GAUNTLET = [
    (1, "plain simple words"),
    (2, "tab\tseparated\ttokens"),
    (3, "double  space   runs"),
    (4, "  leading and trailing  "),
    (5, "mixed \t whitespace\t\tforms"),
    (6, ""),
    (7, "   "),
    (8, "single"),
    (9, "newline\nseparated\nlines"),
    (10, "vertical\x0btab\x0bsplits"),
    (11, "a \x0b b"),
    (12, "form\x0cfeed and\rcarriage"),
]


def _spark_tokens(spark):
    df = spark.createDataFrame(GAUNTLET, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        tokens(F.col("text")).alias("ws"),
        token_count(F.col("text")).alias("n"),
    ).collect()
    return {r.doc_id: (r.ws, r.n) for r in rows}


def test_tokens_match_python_str_split(spark):
    """Python's no-arg str.split() is the semantic spec: \\s+ split after
    trim, zero tokens for empty/whitespace-only."""
    got = _spark_tokens(spark)
    for doc_id, text in GAUNTLET:
        expect = text.split()
        ws, n = got[doc_id]
        assert n == len(expect), (doc_id, text, ws, n)
        if expect:  # empty text yields [''] in the raw array; count guards it
            assert ws == expect, (doc_id, text, ws)


def test_duckdb_twins_match_spark(spark):
    got = _spark_tokens(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", GAUNTLET)
    duck = con.execute(
        f"SELECT doc_id, {tokens_sql('text')} AS ws, "
        f"{token_count_sql('text')} AS n FROM t"
    ).fetchall()
    for doc_id, ws, n in duck:
        s_ws, s_n = got[doc_id]
        assert n == s_n, (doc_id, ws, n, s_n)
        if n:
            assert ws == s_ws, (doc_id, ws, s_ws)


def test_non_regex_whitespace_agrees_across_engines(spark):
    r"""The documented contract edge: \x1c-\x1f and unicode spaces are
    whitespace to Python's str.split() but to NEITHER regex engine —
    both engines must agree with EACH OTHER (no split), which is what
    the oracle gate needs; Python is not the spec for these."""
    cases = [(1, "a\x1cb"), (2, "a\x1db"), (3, "a\u00a0b"), (4, "a\u2003b")]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r.doc_id: (r.ws, r.n)
        for r in df.select(
            "doc_id",
            tokens(F.col("text")).alias("ws"),
            token_count(F.col("text")).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    duck = con.execute(
        f"SELECT doc_id, {tokens_sql('text')} AS ws, "
        f"{token_count_sql('text')} AS n FROM t"
    ).fetchall()
    for doc_id, ws, n in duck:
        assert (ws, n) == got[doc_id], (doc_id, ws, got[doc_id])
        assert n == 1  # neither engine splits — one opaque token


# ------------------------------------------------------------------------
# End-to-end: the formerly space-exact queries on a whitespace-bearing
# corpus, Spark vs their DuckDB oracles.
# ------------------------------------------------------------------------

CORPUS = [
    # doc_id, source, lang, n_chars, text
    (1, "web", "en", 20, "the cat\tsat on  the mat"),
    (2, "web", "en", 10, "the cat sat"),
    (3, "books", "en", 30, "  a different  doc\twith words  "),
    (4, "books", "de", 5, ""),
    (5, "wiki", "en", 15, "the cat\tsat on  the mat"),  # exact dup of 1 mod ws? no: distinct text
    (6, "wiki", "fr", 8, "un deux\ttrois"),
]


@pytest.fixture(scope="module")
def ws_sf_dir(tmp_path_factory):
    """A miniature sf dir holding only documents.parquet, so the real
    (spark, sf_dir) query entrypoints and their oracles run unmodified."""
    import pandas as pd

    d = tmp_path_factory.mktemp("ws_corpus")
    pd.DataFrame(
        CORPUS, columns=["doc_id", "source", "lang", "n_chars", "text"]
    ).to_parquet(d / "documents.parquet")
    return str(d)


def _compare(spark, ws_sf_dir, qfn, sql, sort_cols):
    spark_rows = sorted(
        tuple(r) for r in qfn(spark, ws_sf_dir).select(*sort_cols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{ws_sf_dir}/documents.parquet'"
    )
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT {', '.join(sort_cols)} FROM ({sql})"
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_mix_weights_on_whitespace_corpus(spark, ws_sf_dir):
    from healthcare_aws_data_engineering_spark.plans import corpus_queries as cq

    _compare(
        spark,
        ws_sf_dir,
        cq.q_mix_weights,
        cq._MIX_WEIGHTS_SQL,
        ["source", "n_docs", "n_tokens", "weight_u6", "share_e6", "docs_per_epoch"],
    )


def test_word_bigrams_on_whitespace_corpus(spark, ws_sf_dir):
    from healthcare_aws_data_engineering_spark.plans import corpus_queries as cq

    _compare(
        spark, ws_sf_dir, cq.q_word_bigrams, cq._WORD_BIGRAMS_SQL, ["bigram", "cnt"]
    )
    # tab and double-space boundaries produce the same bigrams as single
    # spaces: "the cat\tsat" contributes ('the cat', 'cat sat').
    got = {r.bigram for r in cq.q_word_bigrams(spark, ws_sf_dir).collect()}
    assert "the cat" in got and "cat sat" in got


def test_dataset_card_on_whitespace_corpus(spark, ws_sf_dir):
    from healthcare_aws_data_engineering_spark.plans import analytics_queries as aq

    _compare(
        spark,
        ws_sf_dir,
        aq.q_dataset_card,
        aq._DATASET_CARD_SQL,
        ["source", "n_docs", "n_tokens", "n_langs", "top_lang", "n_exact_dups"],
    )
    # the empty doc counts 0 tokens on both sides (not 1)
    books = {
        r.source: r.n_tokens
        for r in aq.q_dataset_card(spark, ws_sf_dir).collect()
    }
    assert books["books"] == 5  # "a different doc with words", empty doc adds 0


def test_shard_manifest_empty_doc_counts_zero_tokens(spark, ws_sf_dir):
    """The r6 ADVICE item: the oracle's bare len(string_split_regex(...))
    counted 1 token for empty text while Spark counted 0 — both now ride
    token_count/token_count_sql."""
    from healthcare_aws_data_engineering_spark.operators.ingest import (
        shard_manifest,
        shard_manifest_sql,
    )
    from healthcare_aws_data_engineering_spark.sources.tables import load_table

    docs = load_table(spark, ws_sf_dir, "documents")
    spark_total = (
        shard_manifest(docs).agg(F.sum("total_tokens").alias("t")).collect()[0].t
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{ws_sf_dir}/documents.parquet'"
    )
    duck_total = con.execute(
        f"SELECT SUM(total_tokens) FROM ({shard_manifest_sql('documents')})"
    ).fetchone()[0]
    expect = sum(len(t.split()) for *_, t in CORPUS)
    assert spark_total == duck_total == expect


def test_chunking_space_exact_split_roundtrips_bytes(spark):
    """The documented exception: chunking splits on ' ' (NOT \\s+) so
    non-overlapping chunks re-concatenate to the original text
    byte-exactly, tabs and double spaces preserved."""
    from healthcare_aws_data_engineering_spark.operators.chunking import (
        chunk_documents,
    )

    text = "a\tb  c d e f\tg h i j k l"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = (
        chunk_documents(df, window=4, stride=4, emit_text=True)
        .orderBy("chunk_idx")
        .collect()
    )
    assert " ".join(c.chunk_text for c in chunks) == text
