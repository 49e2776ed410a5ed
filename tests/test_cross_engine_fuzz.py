"""Deterministic cross-engine expression fuzz — Spark (Java regex) vs
DuckDB (RE2) over the repo's shared text-expression surface: the
tokenizer, the fingerprint normalization chain, the punctuation class
and the stopword word-boundary patterns.

The r6 float-literal find and the r7 vertical-tab find were both
LATENT engine divergences the gate corpus couldn't trigger; this fuzz
feeds the expression layer ~400 adversarial strings (whitespace runs,
every ASCII whitespace char, punctuation, unicode letters, an astral
emoji, empties) in ONE batch per engine, so any future drift in these
expression families fails a test instead of waiting for real data.
Seeded RNG → reproducible, no hypothesis shrink loops through the JVM.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators.text import (
    LANG_PROFILES,
    PUNCT_RE,
    PUNCT_RE_SQL,
    WORD_SPLIT_RE_SQL,
    fingerprint,
    stopword_hits,
    token_count,
    token_count_sql,
    tokens,
    tokens_sql,
)

WORDS = ["the", "and", "cat", "x1", "émile", "Straße", "MiXeD", "a_b", "42"]
SEPS = [" ", "\t", "\n", "\x0b", "\f", "\r", "  ", "\t\t", " \x0b ", "\r\n"]
PUNCT = [".", ",", "!", "#", '"', "'", "(", ")", "-", "_", "%", "🙂", "…"]
EDGES = ["", " ", "\t", "\x0b", "\x0b\x0b", "...", "\x1c", " ", "a"]


def _fuzz_corpus(n: int = 400) -> list[tuple[int, str]]:
    rng = random.Random(7)
    rows = [(i, s) for i, s in enumerate(EDGES)]
    for i in range(len(EDGES), n):
        parts = []
        for _ in range(rng.randint(1, 12)):
            r = rng.random()
            if r < 0.55:
                parts.append(rng.choice(WORDS))
            elif r < 0.8:
                parts.append(rng.choice(PUNCT))
            else:
                parts.append(rng.choice(SEPS))
            parts.append(rng.choice(SEPS) if rng.random() < 0.7 else "")
        rows.append((i, "".join(parts)))
    return rows


_EN = "|".join(LANG_PROFILES["en"])
_STOP_RE = rf"\b({_EN})\b"


def test_text_expression_surface_agrees_across_engines(spark):
    rows = _fuzz_corpus()
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r.i: (r.ws, r.n, r.fp, r.punct, r.stop)
        for r in df.select(
            "i",
            tokens(F.col("text")).alias("ws"),
            token_count(F.col("text")).alias("n"),
            fingerprint(F.col("text")).alias("fp"),
            F.regexp_count(F.col("text"), F.lit(PUNCT_RE)).alias("punct"),
            stopword_hits(F.col("text"), LANG_PROFILES["en"]).alias("stop"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        f"""
        SELECT i,
               {tokens_sql('text')} AS ws,
               {token_count_sql('text')} AS n,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                   '{PUNCT_RE_SQL}', '', 'g'),
                   '{WORD_SPLIT_RE_SQL}', ' ', 'g'))) AS fp,
               len(regexp_extract_all(text, '{PUNCT_RE_SQL}')) AS punct,
               len(regexp_extract_all(lower(text), '\\b({_EN})\\b')) AS stop
        FROM t
        """
    ).fetchall()
    diverged = []
    for i, ws, n, fp, punct, stop in duck:
        s_ws, s_n, s_fp, s_punct, s_stop = got[i]
        row_ok = (
            n == s_n
            and fp == s_fp
            and punct == s_punct
            and stop == s_stop
            and (n == 0 or ws == s_ws)
        )
        if not row_ok:
            diverged.append(
                (i, rows[i][1], (s_ws, s_n, s_fp, s_punct, s_stop),
                 (ws, n, fp, punct, stop))
            )
    assert not diverged, diverged[:5]


# ------------------------------------------------------------------------
# Datetime expression surface (the F16-F19 family): CAST→DATE, month
# truncation, day diffs, ISO rendering — Spark vs DuckDB on boundary
# timestamps (epoch edges, leap day, month ends, pre-1970 where
# truncate-toward-zero vs floor would diverge, century boundaries).
# ------------------------------------------------------------------------

TS_GAUNTLET = [
    "1970-01-01 00:00:00",
    "1969-12-31 23:59:59",      # pre-epoch: floor-vs-trunc seam if any
    "1969-07-20 20:17:40",
    "2024-02-29 12:00:00",      # leap day
    "2024-02-29 23:59:59",
    "2023-02-28 23:59:59",
    "2024-01-31 23:59:59",      # month end into a shorter month
    "2024-03-31 00:00:00",
    "2024-12-31 23:59:59",      # year boundary
    "2025-01-01 00:00:00",
    "1900-02-28 12:00:00",      # non-leap century year
    "2000-02-29 00:00:00",      # leap century year
    "1582-10-15 00:00:00",      # Gregorian adoption edge (proleptic both)
    "0987-06-05 04:03:02",      # sub-1000 year: %Y padding
    "2262-04-11 23:47:16",      # int64-nanosecond horizon
]


def test_datetime_expression_surface_agrees_across_engines(spark):
    rows = [(i, s) for i, s in enumerate(TS_GAUNTLET)]
    df = spark.createDataFrame(rows, "i long, s string")
    ts = F.to_timestamp(F.col("s"))
    anchor = F.lit("2024-01-01").cast("date")
    got = {
        r.i: (r.d, r.m, r.dd, r.day, r.iso)
        for r in df.select(
            "i",
            ts.cast("date").cast("string").alias("d"),
            F.date_trunc("month", ts).cast("date").cast("string").alias("m"),
            F.datediff(ts.cast("date"), anchor).cast("long").alias("dd"),
            F.date_format(ts, "yyyy-MM-dd").alias("day"),
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("iso"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        """
        SELECT i,
               CAST(CAST(CAST(s AS TIMESTAMP) AS DATE) AS VARCHAR) AS d,
               CAST(CAST(date_trunc('month', CAST(s AS TIMESTAMP)) AS DATE) AS VARCHAR) AS m,
               CAST(datediff('day', DATE '2024-01-01', CAST(CAST(s AS TIMESTAMP) AS DATE)) AS BIGINT) AS dd,
               strftime(CAST(s AS TIMESTAMP), '%Y-%m-%d') AS day,
               strftime(CAST(s AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS iso
        FROM t
        """
    ).fetchall()
    diverged = []
    for i, d, m, dd, day, iso in duck:
        if (d, m, dd, day, iso) != got[i]:
            diverged.append((TS_GAUNTLET[i], got[i], (d, m, dd, day, iso)))
    assert not diverged, diverged
