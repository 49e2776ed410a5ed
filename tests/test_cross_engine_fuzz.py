"""Deterministic cross-engine expression contracts — Spark vs DuckDB
over every shared expression family the oracles ride:

* text (tokenizer, fingerprint normalization, punctuation class,
  stopword boundaries) — found and closed FOUR seams: Java's \\s
  includes vertical tab where RE2's doesn't; DuckDB's one-arg trim
  strips unicode whitespace where Spark's is ASCII-space-only; Java's
  \\b is unicode-aware where RE2's is ASCII; DuckDB's
  array_to_string([]) is NULL where Spark's array_join([]) is '';
* datetime (cast→date, month trunc, day diffs, ISO rendering) — clean
  across every boundary timestamp probed;
* decimal grid — round(x, 6) agrees everywhere incl. true ties; the
  bare double→DECIMAL cast diverges on large-magnitude ties (canaried);
* string→number parse — DOUBLE agrees on clean literals; integer
  TRY_CAST is not a shared surface (DuckDB parses-and-rounds, canaried);
* array/HOF (r8) — transform/filter/slice/element_at agree under the
  documented translations; found TWO new seams: sequence(a, b) with
  a > b DESCENDS in Spark (implicit -1 step) where generate_series
  returns [] (audited: every repo sequence() site is guarded or
  structurally a <= b), and array_to_string is NULL for ALL-NULL lists
  (generalizing the r7 empty-list find) where array_join is '';
  list_reduce([]) errors, list_sum skips nulls where aggregate(+)
  poisons — all canaried below;
* string slicing (r8) — substr/lpad/rpad/repeat/left/right/instr/
  split_part agree across the whole edge battery EXCEPT: substr at
  position 0 (Spark clamps to 1 and returns n chars, DuckDB returns
  n-1 — the silent cliff under any computed index that underflows),
  and left/right with negative n ('' vs drop-from-other-end). The
  media oracles' hex-chain slicing rides exactly this surface;
* hex/conv (r9) — the draw-key primitive conv(substr(md5,1,12),16,10)
  vs the oracle's '0x' cast: identical on every 1..15-digit hex string
  (any case, leading zeros) and through the %012x round-trip, so the
  48-bit key budget has a 4096x agreement margin; DIVERGES past it —
  [2^63,2^64) agrees only modulo try_cast, 17+ digits RAISES in ANSI
  Spark vs NULL in DuckDB, invalid digits parse as a prefix in Spark
  ('1g'->1) vs NULL, conv trims whitespace and wraps '-1' unsigned,
  and negative keys render two's-complement vs signed under the
  formatters — all canaried;
* NULL ordering (r8) — default ORDER BY placement diverges (Spark
  sorts nulls smallest: NULLS FIRST asc / LAST desc; DuckDB defaults
  NULLS LAST both directions), so ranking over a nullable order column
  needs EXPLICIT placement on both sides; with it spelled, agreement is
  total, and raw string collation is shared codepoint order;
* libm (r9) — media_entropy computes entropy with PYTHON math.log2
  (inside its decode UDF) against DuckDB's log2: pinned bit-identical
  over counts, extreme magnitudes, and exact powers of two — the
  shared-platform-libm assumption fails HERE, not as a 1-ulp hash
  mismatch at the gate;
* bit ops (r9) — media_near_dup's Hamming distance rides
  bit_count(xor(...)) in both engines: pinned over random 64-bit
  values including negatives (two's-complement popcount) and the
  32-bit-halves class the query uses.

The r6 float-literal find and these r7/r8 finds were all LATENT engine
divergences the gate corpus couldn't trigger; each family runs its
adversarial gauntlet in ONE batch per engine, so future drift fails a
test instead of waiting for real data. Seeded RNG → reproducible, no
hypothesis shrink loops through the JVM.
"""

from __future__ import annotations

import random

import duckdb
import pytest
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


# ------------------------------------------------------------------------
# Decimal-grid rounding — the repo's cross-engine float discipline
# (per-row double math → CAST(x AS DECIMAL(p,6)) → exact SUM) rests on
# the casts agreeing. This fuzz established the precise contract:
#
#   * round(x, 6) agrees EVERYWHERE, ties included (half-away on both);
#   * the bare double→DECIMAL cast agrees on every NON-tie — and on the
#     repo's entire input class (products of ≤3 two-decimal factors are
#     exact ≤6-dp values whose doubles sit ~2^-45 of a grid cell away
#     from any midpoint, per sqlsum.py's argument);
#   * but a TRUE tie (odd multiple of 2^-7: decimal expansion ends ...5
#     exactly at digit 7) casts DIFFERENTLY once |x| ≳ 100 — Spark is
#     HALF_UP at every magnitude, DuckDB's cast switches rounding paths
#     with magnitude. The canary below pins the divergence so a DuckDB
#     behavior change (or an oracle that feeds a tie-able expression to
#     a bare cast) surfaces here instead of as a gate mystery.
# ------------------------------------------------------------------------


def test_decimal_grid_cast_agrees_on_the_safe_class(spark):
    """Exact ≤6-dp values (the _dsum input class) across magnitudes —
    bare casts and round() must agree between engines on all of them."""
    vals = [
        round(m * f, 6)
        for m in (0.01, 0.25, 0.07, 123.45, 9999.99)
        for f in (1, -1, 100, 10000, 0.0001)
    ] + [0.0, 1e-6, -1e-6, 999999.999999]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, x double")
    got = {
        r.i: (str(r.c), r.r)
        for r in df.select(
            "i",
            F.col("x").cast("decimal(18,6)").alias("c"),
            F.round("x", 6).alias("r"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        "SELECT i, CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR), round(x, 6) FROM t"
    ).fetchall()
    for i, c, r in duck:
        s_c, s_r = got[i]
        assert float(c) == float(s_c) and r == s_r, (vals[i], (s_c, s_r), (c, r))


def test_decimal_grid_tie_contract_and_canary(spark):
    """Ties: round(x, 6) agrees everywhere; the bare cast diverges at
    |x| ≳ 100 (the measured DuckDB magnitude threshold). If this canary
    ever flips, the _dsum safety argument must be re-audited."""
    ties = [2**-7, 3 * 2**-7, 1 + 2**-7, 123456 + 5 * 2**-7, -(123456 + 5 * 2**-7)]
    rows = [(i, v) for i, v in enumerate(ties)]
    df = spark.createDataFrame(rows, "i long, x double")
    got = {
        r.i: (str(r.c), r.r)
        for r in df.select(
            "i",
            F.col("x").cast("decimal(18,6)").alias("c"),
            F.round("x", 6).alias("r"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = {
        i: (c, r)
        for i, c, r in con.execute(
            "SELECT i, CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR), round(x, 6) FROM t"
        ).fetchall()
    }
    # round(): identical on every tie, both engines half-away
    for i in duck:
        assert duck[i][1] == got[i][1], (ties[i], got[i], duck[i])
    assert got[0][1] == 0.007813 and got[4][1] == -123456.039063
    # small-magnitude ties: the casts agree too
    for i in (0, 1, 2):
        assert float(duck[i][0]) == float(got[i][0])
    # CANARY: large-magnitude tie casts diverge (Spark HALF_UP .039063,
    # DuckDB .039062) — expected, documented, and must stay visible
    assert float(got[3][0]) == 123456.039063  # Spark HALF_UP
    assert float(duck[3][0]) == 123456.039062  # DuckDB's magnitude path
    assert float(duck[4][0]) == -123456.039062


# ------------------------------------------------------------------------
# String→number parse path (the r6 XGB float-literal bug's family):
# TRY_CAST semantics measured precisely.
#   * string→DOUBLE agrees on every clean numeric literal — plain,
#     signed, leading zeros, scientific, whitespace-padded, ±inf/nan
#     spellings, overflow-to-inf, subnormals — EXCEPT DuckDB accepts
#     underscore digit separators ('1_000') that Spark rejects;
#   * string→BIGINT is NOT a shared surface at all: DuckDB parses any
#     numeric and ROUNDS ('1.5'→2, '1e-3'→0, '0x10'→16) where Spark
#     yields NULL for every non-integer literal. Oracles must only
#     TRY_CAST provably-integer strings (digit-only regex extracts) to
#     integer types — canaries below keep the divergence visible.
# ------------------------------------------------------------------------


def test_try_cast_parse_contract(spark):
    agree_double = [
        "1.5", " 1.5", "1.5 ", "  1.5  ", "+5", "-0", ".5", "5.",
        "1e3", "1E3", "1e-3", "1e999", "-1e999", "NaN", "nan",
        "Infinity", "-Infinity", "inf", "", " ", "12.34.56", "1,000",
        "0.30000000000000004", "9007199254740993",
        "1.7976931348623157e308", "5e-324", "00123", "0x10",
    ]
    rows = [(i, s) for i, s in enumerate(agree_double)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {
        r.i: r.d
        for r in df.select(
            "i", F.col("s").try_cast("double").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    import math

    def eq(a, b):
        if a is None or b is None:
            return a is b is None
        return (math.isnan(a) and math.isnan(b)) or a == b

    for i, d in con.execute("SELECT i, TRY_CAST(s AS DOUBLE) FROM t").fetchall():
        assert eq(d, got[i]), (agree_double[i], got[i], d)

    # canaries: the two divergent surfaces stay visible
    assert df.sparkSession.sql(
        "SELECT try_cast('1_000' AS DOUBLE) d, try_cast('1.5' AS BIGINT) l"
    ).collect()[0].asDict() == {"d": None, "l": None}
    dk = con.execute(
        "SELECT TRY_CAST('1_000' AS DOUBLE), TRY_CAST('1.5' AS BIGINT), "
        "TRY_CAST('1e-3' AS BIGINT)"
    ).fetchone()
    assert dk == (1000.0, 2, 0)  # DuckDB: separators + parse-and-round


# ------------------------------------------------------------------------
# Array / higher-order-function family (r8, r7 verdict ask #6): the
# list surfaces the oracles ride — array_join/array_to_string,
# transform/list_transform, filter/list_filter, aggregate/list_sum,
# sequence/generate_series, slice/list_slice, element_at/list_extract —
# gauntleted on empty lists, null elements, out-of-range and negative
# indexes. Contract measured empirically (Spark 4.1.2 / DuckDB 1.x):
#
#   AGREE (the safe translation set):
#   * array_join(arr, sep) ≡ array_to_string(l, sep) on lists with AT
#     LEAST ONE NON-NULL element — both silently skip NULL elements;
#   * transform(arr, x -> f) ≡ list_transform(l, x -> f) (no index);
#   * filter ≡ list_filter (a NULL predicate result drops the element
#     in both);
#   * sequence(a, b, step) ≡ generate_series(a, b, step) with an
#     EXPLICIT step whose sign matches;
#   * slice(arr, s, n) ≡ list_slice(l, s, s+n-1) for s ≥ 1, including
#     beyond-end truncation;
#   * element_at(arr, -k) ≡ list_extract(l, -k) (from the end), and
#     try_element_at(arr, k) ≡ list_extract(l, k) out of range (NULL);
#   * size(NULL) IS NULL ≡ len(NULL) IS NULL.
#
#   DIVERGE (canaried, never translate blindly):
#   * sequence(a, b) with a > b: Spark defaults step to -1 and yields
#     the DESCENDING range; generate_series(a, b) yields []. Oracles
#     must guarantee a <= b or spell the step;
#   * array_to_string is NULL whenever NO non-null element remains —
#     empty list OR all-null list — where array_join is '' (this
#     gauntlet found the all-null generalization of the r7 span_scrub
#     empty-list find; COALESCE the DuckDB side when '' semantics are
#     load-bearing);
#   * aggregate([], init, f) returns init; list_reduce([]) ERRORS —
#     list_reduce is only safe on provably non-empty lists (the
#     media_decode oracle's block count is ≥ 1 by construction);
#   * aggregate(+) over a NULL element is NULL; list_sum SKIPS nulls;
#   * lambda index: transform((x, i) -> i) is 0-based, list_transform
#     1-based (the span_scrub oracle subtracts 1);
#   * element_at(arr, 0) and slice(arr, 0, n) ERROR in Spark; DuckDB
#     returns NULL / treats 0 as 1;
#   * in-class \v: Java reads the vertical-whitespace CLASS
#     (matches U+2028), RE2 reads the vertical-tab CHAR — the repo
#     spells \x0B, which is the single char in BOTH (r7 advice).
# ------------------------------------------------------------------------


def _list_gauntlet() -> list[tuple[int, list[int | None]]]:
    rng = random.Random(11)
    edges: list[list[int | None]] = [
        [], [0], [None], [1, None, 2], [None, None], [-5, 5],
        [2147483647, -2147483648], list(range(20)),
    ]
    rows = [(i, l) for i, l in enumerate(edges)]
    for i in range(len(edges), 120):
        rows.append(
            (i, [rng.randint(-99, 99) if rng.random() > 0.2 else None
                 for _ in range(rng.randint(0, 9))])
        )
    return rows


def test_array_hof_surface_agrees_across_engines(spark):
    rows = _list_gauntlet()
    df = spark.createDataFrame(rows, "i long, l array<int>")
    got = {
        r.i: (r.j, r.t, r.f, r.s, r.e_neg, r.e_try, r.sl)
        for r in df.select(
            "i",
            F.when(
                F.size(F.filter("l", lambda x: x.isNotNull())) > 0,
                F.array_join(F.transform("l", lambda x: x.cast("string")), ","),
            ).alias("j"),
            # arithmetic in BIGINT: ANSI Spark errors on INT overflow at
            # the ±2^31 edge rows (the repo's oracles widen the same way)
            F.transform("l", lambda x: x.cast("long") * 2 + 1).alias("t"),
            F.filter("l", lambda x: x % 3 == 0).alias("f"),
            F.aggregate(
                F.filter("l", lambda x: x.isNotNull()),
                F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("s"),
            F.when(F.size("l") > 0, F.element_at("l", -1)).alias("e_neg"),
            F.try_element_at("l", F.lit(5)).alias("e_try"),
            F.slice("l", 2, 3).alias("sl"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, l INT[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        """
        SELECT i,
          CASE WHEN len(list_filter(l, x -> x IS NOT NULL)) > 0 THEN
            array_to_string(list_transform(l, x -> CAST(x AS VARCHAR)), ',')
          END AS j,
          list_transform(l, x -> CAST(x AS BIGINT) * 2 + 1) AS t,
          list_filter(l, x -> x % 3 = 0) AS f,
          CAST(COALESCE(list_sum(list_filter(l, x -> x IS NOT NULL)), 0)
               AS BIGINT) AS s,
          CASE WHEN len(l) > 0 THEN list_extract(l, -1) END AS e_neg,
          list_extract(l, 5) AS e_try,
          list_slice(l, 2, 4) AS sl
        FROM t
        """
    ).fetchall()
    diverged = []
    for i, j, t, f, s, e_neg, e_try, sl in duck:
        if (j, t, f, s, e_neg, e_try, sl) != got[i]:
            diverged.append((rows[i][1], got[i], (j, t, f, s, e_neg, e_try, sl)))
    assert not diverged, diverged[:5]


def test_sequence_vs_generate_series_contract(spark):
    """Explicit-step ranges agree; the a > b default-step case is the
    new r8 seam — Spark descends, DuckDB returns empty."""
    cases = [(1, 5, 1), (5, 1, -1), (5, 1, -2), (0, 0, 1), (-3, 3, 2)]
    for a, b, step in cases:
        sp = spark.sql(f"SELECT sequence({a}, {b}, {step})").collect()[0][0]
        dk = duckdb.sql(f"SELECT generate_series({a}, {b}, {step})").fetchone()[0]
        assert sp == dk, (a, b, step, sp, dk)
    # CANARY: implicit step with a > b
    assert spark.sql("SELECT sequence(3, 1)").collect()[0][0] == [3, 2, 1]
    assert duckdb.sql("SELECT generate_series(3, 1)").fetchone()[0] == []
    # and DuckDB's range() is end-EXCLUSIVE — never a sequence() twin
    assert duckdb.sql("SELECT range(1, 3)").fetchone()[0] == [1, 2]


def test_array_hof_divergence_canaries(spark):
    # no-non-null-element join: '' vs NULL (r7 find + the all-null
    # generalization this family's gauntlet surfaced)
    assert spark.sql("SELECT array_join(array(), ',')").collect()[0][0] == ""
    assert duckdb.sql("SELECT array_to_string([], ',')").fetchone()[0] is None
    assert spark.sql(
        "SELECT array_join(array(CAST(NULL AS STRING)), ',')"
    ).collect()[0][0] == ""
    assert duckdb.sql(
        "SELECT array_to_string(CAST([NULL] AS VARCHAR[]), ',')"
    ).fetchone()[0] is None
    # empty-list reduce: init vs error
    assert spark.sql(
        "SELECT aggregate(cast(array() as array<int>), 0, (a, x) -> a + x)"
    ).collect()[0][0] == 0
    with pytest.raises(duckdb.Error, match="empty"):
        duckdb.sql(
            "SELECT list_reduce(CAST([] AS INT[]), (a, x) -> a + x)"
        ).fetchone()
    # null-element sum: NULL-poisoning vs skip
    assert spark.sql(
        "SELECT aggregate(array(1, NULL, 2), 0, (a, x) -> a + x)"
    ).collect()[0][0] is None
    assert duckdb.sql("SELECT list_sum([1, NULL, 2])").fetchone()[0] == 3
    # lambda index base: 0 vs 1
    assert spark.sql(
        "SELECT transform(array('a','b'), (x, i) -> i)"
    ).collect()[0][0] == [0, 1]
    assert duckdb.sql(
        "SELECT list_transform(['a','b'], (x, i) -> i)"
    ).fetchone()[0] == [1, 2]
    # index 0: error vs NULL/1-clamp
    with pytest.raises(Exception, match="INVALID_INDEX_OF_ZERO"):
        spark.sql("SELECT element_at(array(1,2,3), 0)").collect()
    assert duckdb.sql("SELECT list_extract([1,2,3], 0)").fetchone()[0] is None
    assert duckdb.sql("SELECT list_slice([1,2,3], 0, 2)").fetchone()[0] == [1, 2]


# ------------------------------------------------------------------------
# String-slicing family (r8): substr with COMPUTED indexes is
# load-bearing in every media oracle (hex-chain slicing `substr(hx,
# 2*i+1, 2)` on both engines) and in lpad'd hex rendering. Contract:
#
#   AGREE: substr on every 1-based in-range position, negative
#   (from-end) positions, beyond-end positions (''), zero/oversized
#   lengths, unicode codepoint indexing; lpad/rpad incl. truncation and
#   zero width; repeat; left/right with n >= 0; instr; reverse;
#   translate; replace; split_part incl. negative index; hex/unhex
#   round trips (DuckDB unhex accepts Spark's uppercase hex output).
#
#   DIVERGE (canaried):
#   * substr(s, 0, n): Spark clamps position 0 to 1 and returns n
#     chars; DuckDB starts the window BEFORE the first char and returns
#     n-1. An index computation that underflows to 0 silently yields
#     different strings — the media oracles' 2*i+1 is >= 1 by
#     construction, and this canary keeps the cliff visible;
#   * left/right with NEGATIVE n: Spark returns ''; DuckDB drops |n|
#     from the other end;
#   * strpos exists only in DuckDB — use instr on both.
# ------------------------------------------------------------------------


def test_string_slicing_surface_agrees_across_engines(spark):
    strs = ["abcdef", "", "a", "héllo wörld", "0a0b0c0d", "xx" * 40]
    rng = random.Random(13)
    rows = []
    i = 0
    for s in strs:
        for pos in [1, 2, len(s) or 1, len(s) + 1, len(s) + 99, -1, -2,
                    -(len(s) or 1), -99]:
            for ln in [0, 1, 2, 99]:
                rows.append((i, s, pos, ln))
                i += 1
    for _ in range(100):
        rows.append(
            (i, rng.choice(strs), rng.randint(1, 20), rng.randint(0, 20))
        )
        i += 1
    df = spark.createDataFrame(rows, "i long, s string, p int, l int")
    got = {
        r.i: (r.sub, r.lp, r.rp, r.rep, r.lft, r.rgt, r.ins, r.spl)
        for r in df.selectExpr(
            "i",
            "substr(s, p, l) AS sub",
            "lpad(s, l, '0') AS lp",
            "rpad(s, l, 'xy') AS rp",
            "repeat(s, l % 4) AS rep",
            "left(s, l) AS lft",
            "right(s, l) AS rgt",
            "instr(s, 'b') AS ins",
            "split_part(s, 'b', 2) AS spl",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR, p INT, l INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    duck = con.execute(
        """
        SELECT i, substr(s, p, l), lpad(s, l, '0'), rpad(s, l, 'xy'),
               repeat(s, l % 4), left(s, l), right(s, l),
               CAST(instr(s, 'b') AS BIGINT), split_part(s, 'b', 2)
        FROM t
        """
    ).fetchall()
    diverged = [
        (rows[i][1:], got[i], vals)
        for i, *vals in duck
        if tuple(vals) != got[i]
    ]
    assert not diverged, diverged[:5]


def test_string_slicing_divergence_canaries(spark):
    # substr position 0: Spark clamps to 1 (full n), DuckDB eats one
    assert spark.sql("SELECT substr('abcdef', 0, 3)").collect()[0][0] == "abc"
    assert duckdb.sql("SELECT substr('abcdef', 0, 3)").fetchone()[0] == "ab"
    # negative left/right: '' vs drop-from-other-end
    assert spark.sql(
        "SELECT left('abcdef', -2), right('abcdef', -2)"
    ).collect()[0][0:2] == ("", "")
    assert duckdb.sql(
        "SELECT left('abcdef', -2), right('abcdef', -2)"
    ).fetchone() == ("abcd", "cdef")
    # hex case: Spark hex() is UPPERCASE, DuckDB's unhex accepts it
    # (the media encoder unhexes its own mixed-case concat) — and
    # DuckDB md5() output is lowercase, matching Spark's F.md5
    assert spark.sql("SELECT hex('ab')").collect()[0][0] == "6162"
    assert duckdb.sql("SELECT unhex('6A6B')").fetchone()[0] == b"jk"
    assert duckdb.sql("SELECT md5('x')").fetchone()[0] == \
        spark.sql("SELECT md5('x')").collect()[0][0]


# ------------------------------------------------------------------------
# NULL-ordering family (r8): default NULL placement in ORDER BY (sorts
# AND window frames) is a silent rank-shifter —
#   Spark:  ASC → NULLS FIRST, DESC → NULLS LAST (nulls sort "smallest")
#   DuckDB: NULLS LAST for BOTH directions (its default_null_order)
# so any ROW_NUMBER/rank/top-k over a NULLABLE order column diverges
# between an oracle and its Spark twin unless NULLS FIRST/LAST is
# spelled EXPLICITLY on both sides. Audited: every current oracle
# either orders by non-null-by-construction columns (ids, counts,
# md5 keys) or filters nulls before ranking — this family exists so
# the FIRST nullable order column added to a query fails a test here
# instead of hash-mismatching at the gate. With explicit placement the
# engines agree everywhere, including multi-key orders; raw byte
# collation of strings (codepoint order) also agrees.
# ------------------------------------------------------------------------


def test_null_ordering_divergence_canary_and_explicit_agreement(spark):
    sp = spark.sql(
        "SELECT v, ROW_NUMBER() OVER (ORDER BY v ASC) rn_asc,"
        " ROW_NUMBER() OVER (ORDER BY v DESC) rn_desc"
        " FROM (VALUES (1),(CAST(NULL AS INT)),(2)) t(v)"
    ).collect()
    sp_by_v = {r.v: (r.rn_asc, r.rn_desc) for r in sp}
    dk = duckdb.sql(
        "SELECT v, ROW_NUMBER() OVER (ORDER BY v ASC) rn_asc,"
        " ROW_NUMBER() OVER (ORDER BY v DESC) rn_desc"
        " FROM (VALUES (1),(NULL),(2)) t(v)"
    ).fetchall()
    dk_by_v = {v: (a, d) for v, a, d in dk}
    # CANARY: the defaults disagree on where the NULL ranks ASC
    assert sp_by_v[None] == (1, 3)  # Spark: nulls smallest
    assert dk_by_v[None] == (3, 3)  # DuckDB: nulls last both ways
    assert sp_by_v[1] == (2, 2) and dk_by_v[1] == (1, 2)

    # EXPLICIT placement restores agreement in every combination
    for place in ("NULLS FIRST", "NULLS LAST"):
        for direction in ("ASC", "DESC"):
            q = (
                f"SELECT v, ROW_NUMBER() OVER (ORDER BY v {direction} "
                f"{place}) rn FROM (VALUES (1),({{null}}),(2)) t(v)"
            )
            sp2 = {
                r.v: r.rn
                for r in spark.sql(
                    q.format(null="CAST(NULL AS INT)")
                ).collect()
            }
            dk2 = {
                v: rn
                for v, rn in duckdb.sql(q.format(null="NULL")).fetchall()
            }
            assert sp2 == dk2, (direction, place, sp2, dk2)


def test_string_byte_collation_agrees(spark):
    """Raw codepoint ordering of strings (digits < uppercase < '_' <
    lowercase < accented) is identical — no locale collation sneaks into
    either engine's default ORDER BY."""
    vals = ["a", "B", "á", "Z", "_", "0", "", " ", "zz", "Z9", "é́"]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, s string")
    sp = [r.s for r in df.orderBy("s", "i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dk = [r[0] for r in con.execute("SELECT s FROM t ORDER BY s, i").fetchall()]
    assert sp == dk


def test_vertical_tab_class_canary(spark):
    r"""The r7-advice regex seam, pinned empirically: inside a character
    class Java's \v is the vertical-whitespace CLASS (U+2028 matches!),
    RE2's \v is the vertical-tab CHARACTER. \x0B is the single char in
    both — the only safe spelling for a literal that may be rendered
    into either engine (operators/text.py, plans/testdata_queries.py)."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(ls=chr(0x2028), vt=chr(11))])
    r = df.select(
        F.regexp_count("ls", F.lit(r"[\v]")).alias("java_v_ls"),
        F.regexp_count("vt", F.lit(r"[\v]")).alias("java_v_vt"),
        F.regexp_count("ls", F.lit(r"[\x0B]")).alias("java_x_ls"),
        F.regexp_count("vt", F.lit(r"[\x0B]")).alias("java_x_vt"),
    ).collect()[0]
    # Java: [\v] admits U+2028 (the class); [\x0B] does not (the char)
    assert (r.java_v_ls, r.java_v_vt, r.java_x_ls, r.java_x_vt) == (1, 1, 0, 1)
    dk = duckdb.sql(
        r"""SELECT len(regexp_extract_all(chr(8232), '[\v]')),
                   len(regexp_extract_all(chr(11), '[\v]')),
                   len(regexp_extract_all(chr(8232), '[\x0B]')),
                   len(regexp_extract_all(chr(11), '[\x0B]'))"""
    ).fetchone()
    # RE2: [\v] and [\x0B] are BOTH just the vertical-tab char
    assert dk == (0, 1, 0, 1)


# ------------------------------------------------------------------------
# hex/conv family (r9): conv(substring(md5(x),1,12),16,10) is THE
# draw-key/split-assign primitive (mixture_draw, split_assign,
# eval_draw, stratified_sample, importance_sample, ...) and every
# oracle replays it as CAST(('0x' || substr(md5(x),1,12)) AS BIGINT).
# Contract, pinned empirically below:
#
#   AGREE (the load-bearing class): any hex string of 1..15 digits —
#   i.e. every value < 2^60, which covers the 48-bit (12-digit) keys
#   with a 4096x margin — parses to the same BIGINT regardless of
#   case or leading zeros; lower(format_string('%012x', k)) ==
#   format('{:012x}', k) round-trips every non-negative 48-bit value;
#   hex()/to_hex() are BOTH uppercase; md5() is lowercase in both; the
#   full md5→substr→parse→reformat chain is the identity on both
#   engines; try_cast of the empty string is NULL in both.
#
#   DIVERGE (canaried — why 12 digits is a hard budget, not a habit):
#   * 16 hex digits >= '8...' (values in [2^63, 2^64)): Spark conv
#     returns the UNSIGNED decimal string (cast to BIGINT then fails /
#     try_cast NULLs), DuckDB's '0x' cast NULLs directly — agreement
#     survives only modulo try_cast, and the intermediate strings
#     differ;
#   * 17+ hex digits: Spark conv RAISES ARITHMETIC_OVERFLOW under ANSI
#     (constant-folding included) where DuckDB try_cast returns NULL —
#     an oracle pair that drifts past 64 bits fails loudly on one side
#     and silently on the other;
#   * invalid digits: Spark conv parses the longest valid PREFIX
#     ('1g' -> 1, 'xyz' -> 0) where DuckDB NULLs — a corrupted key
#     column silently becomes zeros in Spark only;
#   * surrounding whitespace: Spark conv trims (' ab ' -> 171), DuckDB
#     NULLs;
#   * '-1': Spark conv wraps to 2^64-1 (unsigned), DuckDB NULLs;
#   * negative format: Spark '%012x' renders two's complement
#     ('ffffffffffffffff'), DuckDB format('{:012x}') renders a SIGNED
#     '-00000000001' — never format a possibly-negative key.
# ------------------------------------------------------------------------


def test_conv_hex_surface_agrees_across_engines(spark):
    rng = random.Random(9)
    hexes = []
    for ln in range(1, 16):  # 1..15 digits: strictly under 2^60
        for _ in range(12):
            h = "".join(rng.choice("0123456789abcdef") for _ in range(ln))
            hexes.append(h)
            hexes.append(h.upper())
            hexes.append(h.rjust(12, "0"))  # leading zeros, key width
    rows = [(i, h) for i, h in enumerate(hexes)]
    df = spark.createDataFrame(rows, "i long, h string")
    got = {
        r.i: (r.v, r.rt)
        for r in df.selectExpr(
            "i",
            "CAST(conv(h, 16, 10) AS BIGINT) AS v",
            # round-trip through the %012x renderer (12+ digit inputs
            # with leading zeros must reproduce themselves lowercased)
            "lower(format_string('%012x', CAST(conv(h, 16, 10) AS BIGINT))) AS rt",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        """
        SELECT i, CAST(('0x' || h) AS BIGINT),
               format('{:012x}', CAST(('0x' || h) AS BIGINT))
        FROM t
        """
    ).fetchall()
    diverged = [
        (hexes[i], got[i], (v, rt)) for i, v, rt in duck if (v, rt) != got[i]
    ]
    assert not diverged, diverged[:5]
    # every parsed value equals Python's int(h, 16)
    for i, h in rows:
        assert got[i][0] == int(h, 16), (h, got[i])

    # the full draw-key chain over arbitrary strings is identical
    strs = [(i, s) for i, s in enumerate(
        ["", "a", "doc#42", "héllo", "7#ep:3", " ", "0" * 40]
        + [f"{rng.randrange(10**9)}#ep:{rng.randrange(8)}" for _ in range(60)]
    )]
    df2 = spark.createDataFrame(strs, "i long, s string")
    sp = {
        r.i: r.k
        for r in df2.selectExpr(
            "i", "CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT) AS k"
        ).collect()
    }
    con.execute("CREATE TABLE u (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", strs)
    dk = dict(con.execute(
        "SELECT i, CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) FROM u"
    ).fetchall())
    assert sp == dk
    assert all(0 <= v < 2**48 for v in sp.values())


def test_conv_hex_divergence_canaries(spark):
    import pyspark.errors

    # [2^63, 2^64): Spark conv emits the unsigned DECIMAL STRING;
    # BIGINT agreement survives only modulo try_cast (both NULL)
    assert spark.sql(
        "SELECT conv('8000000000000000', 16, 10)"
    ).collect()[0][0] == "9223372036854775808"
    assert spark.sql(
        "SELECT TRY_CAST(conv('ffffffffffffffff', 16, 10) AS BIGINT)"
    ).collect()[0][0] is None
    assert duckdb.sql(
        "SELECT TRY_CAST('0xffffffffffffffff' AS BIGINT)"
    ).fetchone()[0] is None
    # 2^63-1 is the last agreeing value
    assert spark.sql(
        "SELECT CAST(conv('7fffffffffffffff', 16, 10) AS BIGINT)"
    ).collect()[0][0] == 2**63 - 1 == duckdb.sql(
        "SELECT CAST('0x7fffffffffffffff' AS BIGINT)"
    ).fetchone()[0]

    # 17 digits: ANSI Spark RAISES where DuckDB try_cast NULLs
    with pytest.raises(pyspark.errors.PySparkException):
        spark.sql("SELECT conv('10000000000000000', 16, 10)").collect()
    assert duckdb.sql(
        "SELECT TRY_CAST('0x10000000000000000' AS BIGINT)"
    ).fetchone()[0] is None

    # invalid digits: Spark parses the valid PREFIX, DuckDB NULLs
    assert spark.sql("SELECT conv('1g', 16, 10)").collect()[0][0] == "1"
    assert spark.sql("SELECT conv('xyz', 16, 10)").collect()[0][0] == "0"
    assert duckdb.sql("SELECT TRY_CAST('0x1g' AS BIGINT)").fetchone()[0] is None

    # whitespace: Spark conv trims, DuckDB NULLs
    assert spark.sql("SELECT conv(' ab ', 16, 10)").collect()[0][0] == "171"
    assert duckdb.sql("SELECT TRY_CAST('0x ab ' AS BIGINT)").fetchone()[0] is None

    # '-1': Spark wraps unsigned to 2^64-1, DuckDB NULLs
    assert spark.sql(
        "SELECT conv('-1', 16, 10)"
    ).collect()[0][0] == "18446744073709551615"
    assert duckdb.sql("SELECT TRY_CAST('0x-1' AS BIGINT)").fetchone()[0] is None

    # negative values under the formatter: two's complement vs signed
    assert spark.sql(
        "SELECT format_string('%012x', -1L)"
    ).collect()[0][0] == "ffffffffffffffff"
    assert duckdb.sql("SELECT format('{:012x}', -1)").fetchone()[0] == "-00000000001"

    # shared case conventions: hex()/to_hex() UPPER, md5() lower
    assert spark.sql("SELECT hex('ab')").collect()[0][0] == "6162"
    assert duckdb.sql("SELECT to_hex(24930)").fetchone()[0] == "6162"
    assert spark.sql("SELECT conv('', 16, 10)").collect()[0][0] is None
    assert duckdb.sql("SELECT TRY_CAST('0x' AS BIGINT)").fetchone()[0] is None


# ------------------------------------------------------------------------
# libm family (r9): media_entropy's Shannon entropy is computed with
# PYTHON math.log2 (inside the Arrow-batched decode UDF) and replayed
# with DuckDB's log2 — the cross-engine contract there is "both bottom
# out in the same platform libm". Pin that assumption directly: if a
# DuckDB build ever ships its own log2 (or the platform libm changes
# rounding), this fails here instead of as a 1-ulp entropy hash
# mismatch at the gate. No Spark needed — the Spark side of that
# contract IS CPython's math.log2.
# ------------------------------------------------------------------------


def test_python_log2_matches_duckdb_log2_bitwise():
    import math

    rng = random.Random(42)
    vals = (
        [float(i) for i in range(1, 2000)]            # histogram counts
        + [rng.uniform(1e-300, 1e300) for _ in range(2000)]
        + [2.0**e for e in range(-1000, 1000, 7)]     # exact powers
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    dk = dict(con.execute("SELECT i, log2(v) FROM t").fetchall())
    diverged = [
        (vals[i], math.log2(vals[i]), dk[i])
        for i in range(len(vals))
        if math.log2(vals[i]) != dk[i]
    ]
    assert not diverged, diverged[:5]


def test_bit_count_xor_surface_agrees(spark):
    """media_near_dup's Hamming distance is bit_count(xor(h32a, h32b))
    in both engines — pin the pair over random 64-bit values including
    negatives (two's complement popcount must agree) and the exact
    32-bit-halves class the query actually uses."""
    rng = random.Random(11)
    rows = [
        (i, rng.getrandbits(63) - (1 << 62), rng.getrandbits(32))
        for i in range(300)
    ] + [(300, -1, 0), (301, -(2**62), 2**31), (302, 0, 0)]
    df = spark.createDataFrame(rows, "i long, a long, b long")
    got = {
        r.i: (r.pc, r.hx)
        for r in df.selectExpr(
            "i",
            "bit_count(a) AS pc",
            "bit_count(a ^ b) AS hx",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    dk = con.execute(
        "SELECT i, bit_count(a), bit_count(xor(a, b)) FROM t"
    ).fetchall()
    diverged = [(i, got[i], (p, h)) for i, p, h in dk if (p, h) != got[i]]
    assert not diverged, diverged[:5]
