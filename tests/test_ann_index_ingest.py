"""Incremental IVF-PQ index maintenance (streaming/ann_index.py — r14
verdict stretch #9): the index as an appendable artifact. Pins: index
rows are a pure per-row function of frozen quantizers (accrued ingest ==
from-scratch build on the union, row-identical), serve-from-accrued ==
``ivfpq_topk`` on the union (both pricing modes), the factored
build+serve == the inline ``ivfpq_topk`` path (refactor guard),
at-least-once batch replay is a no-op, bookmark no-op, and the drift
probe orders a shifted snapshot above an in-distribution one."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from healthcare_aws_data_engineering_spark.operators import similarity as S
from healthcare_aws_data_engineering_spark.streaming import ann_index as AI


def _vecs(seed, ids, dim=8, shift=0.0):
    rnd = random.Random(seed)
    return [
        Row(
            vec_id=i,
            embedding=[rnd.uniform(-2, 2) + shift for _ in range(dim)],
        )
        for i in ids
    ]


@pytest.fixture(scope="module")
def frames(spark):
    s1 = spark.createDataFrame(_vecs(1, range(0, 40)))
    s2 = spark.createDataFrame(_vecs(2, range(40, 80)))
    union = s1.unionByName(s2)
    cents = S.sample_centroids(union, 4)
    books = S.pq_codebooks(union)
    return {
        "s1": s1,
        "s2": s2,
        "union": union,
        "cents": cents,
        "books": books,
        "queries": spark.createDataFrame(_vecs(3, range(1000, 1005))),
    }


def _rows(df):
    return sorted((r.neighbor_id, r.cell, tuple(r.codes)) for r in df.collect())


def test_index_of_union_is_union_of_indexes(frames):
    """The soundness condition for appending: frozen quantizers make
    index rows a pure per-row function, so per-snapshot builds union to
    exactly the from-scratch build."""
    a = S.ivfpq_index_rows(frames["s1"], frames["cents"], frames["books"])
    b = S.ivfpq_index_rows(frames["s2"], frames["cents"], frames["books"])
    whole = S.ivfpq_index_rows(
        frames["union"], frames["cents"], frames["books"]
    )
    assert _rows(a.unionByName(b)) == _rows(whole)


def test_factored_build_serve_equals_inline_ivfpq(frames):
    """Refactor guard: ivfpq_topk == ivfpq_index_rows + ivfpq_serve with
    the same frozen quantizers, in BOTH pricing modes."""
    for residual in (False, True):
        books = (
            S.residual_codebooks(frames["union"], frames["cents"])
            if residual
            else frames["books"]
        )
        inline = S.ivfpq_topk(
            frames["union"],
            frames["queries"],
            k=5,
            centroids=frames["cents"],
            codebooks=books,
            residual=residual,
        )
        index = S.ivfpq_index_rows(
            frames["union"], frames["cents"], books, residual=residual
        )
        split = S.ivfpq_serve(
            index,
            frames["queries"],
            frames["cents"],
            books,
            k=5,
            residual=residual,
        )
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, split.collect())
        ), residual


def test_ingest_accrues_and_serves_like_scratch(spark, tmp_path, frames):
    """The streaming arc: two snapshots drained by bookmarked ingest
    runs accrue an index equal to the from-scratch build row-for-row; a
    third run is a no-op; serving from the accrued index matches
    ivfpq_topk on the union exactly."""
    raw = str(tmp_path / "raw")
    idx = str(tmp_path / "index")
    cp = str(tmp_path / "cp")
    frames["s1"].coalesce(1).write.mode("append").parquet(raw)
    AI.ivfpq_index_ingest(
        spark, raw, idx, cp, frames["cents"], frames["books"]
    )
    frames["s2"].coalesce(1).write.mode("append").parquet(raw)
    AI.ivfpq_index_ingest(
        spark, raw, idx, cp, frames["cents"], frames["books"]
    )
    AI.ivfpq_index_ingest(  # bookmark: no new files, no new rows
        spark, raw, idx, cp, frames["cents"], frames["books"]
    )
    accrued = AI.load_index(spark, idx)
    want = S.ivfpq_index_rows(
        frames["union"], frames["cents"], frames["books"]
    )
    assert _rows(accrued) == _rows(want)

    served = AI.load_index(spark, idx)
    got = S.ivfpq_serve(
        served, frames["queries"], frames["cents"], frames["books"], k=5
    )
    ref = S.ivfpq_topk(
        frames["union"],
        frames["queries"],
        k=5,
        centroids=frames["cents"],
        codebooks=frames["books"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_index_batch_replay_is_idempotent(spark, tmp_path, frames):
    """foreachBatch is at-least-once: replaying a batch id (even after a
    partial first attempt) leaves exactly one copy of its rows and
    other batches' partitions untouched."""
    idx = str(tmp_path / "index")
    cents, books = frames["cents"], frames["books"]
    AI._write_index_batch(frames["s1"], 0, idx, cents, books)
    AI._write_index_batch(frames["s1"].limit(7), 0, idx, cents, books)
    AI._write_index_batch(frames["s1"], 0, idx, cents, books)
    AI._write_index_batch(frames["s2"], 1, idx, cents, books)
    got = _rows(AI.load_index(spark, idx))
    want = _rows(
        S.ivfpq_index_rows(frames["union"], cents, books)
    )
    assert got == want


def test_quantizer_drift_orders_shifted_snapshot(spark, frames):
    """The retrain signal: a distribution-shifted snapshot prices
    strictly worse (higher mean assignment distance) under the frozen
    centroids than an in-distribution snapshot of the same size, and
    occupancy skew rises with it."""
    fresh = spark.createDataFrame(_vecs(9, range(200, 240)))
    shifted = spark.createDataFrame(_vecs(9, range(200, 240), shift=5.0))
    base = AI.quantizer_drift(fresh, frames["cents"]).collect()[0]
    drift = AI.quantizer_drift(shifted, frames["cents"]).collect()[0]
    assert base.n_vectors == drift.n_vectors == 40
    assert drift.mean_cell_dist > base.mean_cell_dist
    assert drift.max_cell_frac >= base.max_cell_frac
