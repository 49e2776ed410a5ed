"""Cross-snapshot ledger decontamination (operators/decontam.py — r13
verdict stretch #8): a NEW eval set screened against an already-ingested
corpus via the persisted per-doc shingle ledger, with NO corpus text
re-scan. Pins: ledger == batch-text twin (exact), batch-text twin ==
DuckDB replay (independent engine), ledger appendability across
snapshots, bloom-pruned == plain, and eval-clone contamination at 1.0.
"""

from __future__ import annotations

import duckdb
import pytest

from healthcare_aws_data_engineering_spark.operators import decontam as D

SNAP1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "how vexingly quick daft zebras jump around the park"),
    (4, "sphinx of black quartz judge my vow said the king"),
]
SNAP2 = [
    (5, "the quick brown fox jumps over the lazy dog tonight"),  # clone of 1
    (6, "bright vixens jump dozy fowl quack and run away fast"),
    (7, "jackdaws love my big sphinx of quartz every single day"),
    (8, "a b"),  # shorter than the shingle width: single fallback shingle
]
# eval: one verbatim corpus clone, one partial overlap, one disjoint
EVAL = [
    (101, "the quick brown fox jumps over the lazy dog tonight"),
    (102, "sphinx of black quartz judge my vow said the queen"),
    (103, "completely unrelated benchmark text with novel words only"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _key(rows):
    return {
        r.doc_id: (
            r.n_shingles,
            r.n_overlap,
            r.overlap_ratio,
            r.contaminated,
        )
        for r in rows
    }


@pytest.fixture(scope="module")
def frames(spark):
    corpus = _df(spark, SNAP1 + SNAP2)
    return {
        "s1": _df(spark, SNAP1),
        "s2": _df(spark, SNAP2),
        "corpus": corpus,
        "eval": _df(spark, EVAL),
    }


def test_ledger_equals_batch_text_twin(frames):
    """THE stretch pin: screening via the persisted ledger (no text) is
    row-identical to the full batch text-side re-scan."""
    ledger = D.shingle_ledger(frames["s1"]).union(
        D.shingle_ledger(frames["s2"])
    )
    got = _key(D.ledger_decontaminate(ledger, frames["eval"]).collect())
    want = _key(
        D.decontaminate_external(frames["corpus"], frames["eval"]).collect()
    )
    assert got == want
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 8}


def test_batch_twin_matches_duckdb(frames):
    """Independent-engine anchor: the batch text twin replayed by DuckDB
    (its own regex split, unnest shingling, join, and aggregate)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE corpus(doc_id BIGINT, text VARCHAR);"
        "CREATE TABLE eval(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO corpus VALUES (?, ?)", SNAP1 + SNAP2)
    con.executemany("INSERT INTO eval VALUES (?, ?)", EVAL)
    sql = r"""
WITH
  cw AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0B\f\r]+') AS ws
         FROM corpus),
  csh AS (
    SELECT DISTINCT doc_id,
           CASE WHEN len(ws) >= 3 THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                ELSE array_to_string(ws, ' ') END AS shingle
    FROM cw, unnest(generate_series(1, greatest(1, len(ws)-2))) AS t(i)),
  ew AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0B\f\r]+') AS ws
         FROM eval),
  esh AS (
    SELECT DISTINCT
           CASE WHEN len(ws) >= 3 THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                ELSE array_to_string(ws, ' ') END AS shingle, 1 AS hit
    FROM ew, unnest(generate_series(1, greatest(1, len(ws)-2))) AS t(i))
SELECT doc_id, n_shingles, n_overlap,
       CAST(CAST(round(n_overlap / CAST(n_shingles AS DOUBLE), 6) AS DECIMAL(18,6))
            AS DOUBLE) AS overlap_ratio,
       n_overlap / CAST(n_shingles AS DOUBLE) >= 0.15 AS contaminated
FROM (
  SELECT csh.doc_id, COUNT(*) AS n_shingles,
         CAST(COALESCE(SUM(esh.hit), 0) AS BIGINT) AS n_overlap
  FROM csh LEFT JOIN esh USING (shingle) GROUP BY csh.doc_id)
"""
    want = {
        int(d): (int(ns), int(no), ratio, bool(c))
        for d, ns, no, ratio, c in con.execute(sql).fetchall()
    }
    got = _key(
        D.decontaminate_external(frames["corpus"], frames["eval"]).collect()
    )
    assert got == want


def test_ledger_is_appendable_across_snapshots(frames):
    """ledger(s1) UNION ledger(s2) is the SAME multiset of rows as
    ledger(s1 UNION s2) — the property that makes per-snapshot appends
    a valid index build."""
    a = sorted(
        map(
            tuple,
            D.shingle_ledger(frames["s1"])
            .union(D.shingle_ledger(frames["s2"]))
            .collect(),
        )
    )
    b = sorted(map(tuple, D.shingle_ledger(frames["corpus"]).collect()))
    assert a == b


def test_bloom_pruned_ledger_path_is_identical(frames):
    ledger = D.shingle_ledger(frames["corpus"])
    plain = _key(D.ledger_decontaminate(ledger, frames["eval"]).collect())
    pruned = _key(
        D.ledger_decontaminate(
            ledger, frames["eval"], prune_fpp=0.01
        ).collect()
    )
    assert plain == pruned


def test_eval_clone_is_fully_contaminated(frames):
    ledger = D.shingle_ledger(frames["corpus"])
    got = _key(D.ledger_decontaminate(ledger, frames["eval"]).collect())
    # docs 1 and 5 are verbatim copies of eval doc 101
    for clone in (1, 5):
        ns, no, ratio, flag = got[clone]
        assert ns == no and ratio == 1.0 and flag
    # doc 4 shares all but the final word with eval doc 102: of its 8
    # shingles only the one containing the changed last word misses
    ns, no, ratio, flag = got[4]
    assert ns == 8 and no == 7 and flag
    # disjoint docs stay clean
    assert got[2][1] == 0 and not got[2][3]
    assert got[6][1] == 0 and not got[6][3]


def test_short_doc_fallback_shingle(frames):
    """Docs below the shingle width contribute their single fallback
    shingle through the ledger exactly like the batch path."""
    ledger = D.shingle_ledger(frames["corpus"])
    got = _key(D.ledger_decontaminate(ledger, frames["eval"]).collect())
    ns, no, ratio, flag = got[8]
    assert ns == 1 and no == 0 and not flag


def test_streaming_ledger_ingest_accrues_and_matches_batch(
    spark, tmp_path, frames
):
    """The streaming arc (r14): two snapshots land as parquet files and
    are drained by two bookmarked shingle_ledger_ingest runs — the
    accrued ledger equals the batch ledger of the union row-for-row, a
    third run is a no-op (bookmark semantics), and screening the
    accrued ledger against the NEW eval set matches the batch text-side
    twin exactly."""
    from healthcare_aws_data_engineering_spark.streaming.decontam import (
        shingle_ledger_ingest,
    )

    raw = str(tmp_path / "raw")
    ledger_path = str(tmp_path / "ledger")
    cp = str(tmp_path / "cp")
    frames["s1"].coalesce(1).write.mode("append").parquet(raw)
    shingle_ledger_ingest(spark, raw, ledger_path, cp)
    frames["s2"].coalesce(1).write.mode("append").parquet(raw)
    shingle_ledger_ingest(spark, raw, ledger_path, cp)
    # bookmark: a third run with no new files appends nothing
    shingle_ledger_ingest(spark, raw, ledger_path, cp)

    accrued = spark.read.parquet(ledger_path)
    want_rows = sorted(
        map(tuple, D.shingle_ledger(frames["corpus"]).collect())
    )
    # the idempotent sink adds a __batch_id partition key (r14 advice);
    # the ledger's two payload columns are unchanged
    assert sorted(
        map(tuple, accrued.select("doc_id", "shingle_hash").collect())
    ) == want_rows

    got = _key(D.ledger_decontaminate(accrued, frames["eval"]).collect())
    want = _key(
        D.decontaminate_external(frames["corpus"], frames["eval"]).collect()
    )
    assert got == want


def test_ledger_ingest_batch_replay_is_idempotent(spark, tmp_path, frames):
    """r14 advice (medium): foreachBatch is at-least-once — a crash
    between the ledger write and the checkpoint commit replays the
    batch on restart. The partition-keyed overwrite sink must make the
    replay a no-op on the final rows: writing the SAME batch id twice
    (even a partial first attempt) leaves exactly one copy, and other
    batches' partitions are untouched."""
    from healthcare_aws_data_engineering_spark.streaming.decontam import (
        _write_ledger_batch,
    )

    ledger_path = str(tmp_path / "ledger")
    _write_ledger_batch(frames["s1"], 0, ledger_path)
    # simulate a crash-replay of batch 0: first attempt wrote only a
    # prefix of the snapshot, the restarted attempt writes it whole
    _write_ledger_batch(frames["s1"].limit(2), 0, ledger_path)
    _write_ledger_batch(frames["s1"], 0, ledger_path)
    _write_ledger_batch(frames["s2"], 1, ledger_path)

    got = sorted(
        map(
            tuple,
            spark.read.parquet(ledger_path)
            .select("doc_id", "shingle_hash")
            .collect(),
        )
    )
    want = sorted(
        map(tuple, D.shingle_ledger(frames["corpus"]).collect())
    )
    assert got == want
