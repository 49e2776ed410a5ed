"""Streaming layer tests: Glue-bookmark-parity incremental ingest
(checkpointed availableNow runs process each raw file exactly once) and
the watermarked windowed-aggregation extension (streaming result ==
batch twin on a bounded source).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.sources.tables import load_table
from healthcare_aws_data_engineering_spark.streaming.incremental import (
    incremental_fhir_ingest,
    infer_bundle_schema,
)
from healthcare_aws_data_engineering_spark.streaming.windows import (
    run_available_now_to_memory,
    windowed_event_counts,
)

from test_fhir_etl import CONDITION_SINGLE_CC, OBSERVATIONS, PATIENT, bundle


def test_incremental_ingest_bookmark_semantics(spark, tmp_path):
    """Run 1 ingests the initial drop; run 2 with new files appended
    processes ONLY the new files (no re-processing, no duplicates)."""
    raw = tmp_path / "raw"
    curated = tmp_path / "curated"
    ckpt = tmp_path / "ckpt"
    raw.mkdir()

    (raw / "drop1.json").write_text(bundle([PATIENT] + OBSERVATIONS))
    schema = infer_bundle_schema(spark, str(raw))
    incremental_fhir_ingest(spark, str(raw), str(curated), str(ckpt), schema=schema)

    obs1 = spark.read.parquet(str(curated / "observation"))
    n1 = obs1.count()
    assert n1 == len(OBSERVATIONS)
    assert spark.read.parquet(str(curated / "patient")).count() == 1

    # second drop: one new bundle with one new observation id
    new_obs = dict(OBSERVATIONS[0])
    (raw / "drop2.json").write_text(
        bundle([CONDITION_SINGLE_CC, {**new_obs, "id": "obs-new-1"}])
    )
    incremental_fhir_ingest(spark, str(raw), str(curated), str(ckpt), schema=schema)

    obs2 = spark.read.parquet(str(curated / "observation"))
    assert obs2.count() == n1 + 1  # only the new file's rows appended
    assert obs2.filter(F.col("observation_id") == "obs-new-1").count() == 1
    # drop1's observations were NOT re-ingested
    ids = [r.observation_id for r in obs2.groupBy("observation_id").count()
           .filter("count > 1").collect()]
    assert ids == []
    # condition table appeared from run 2
    assert spark.read.parquet(str(curated / "condition")).count() == 1


def test_incremental_ingest_noop_when_no_new_files(spark, tmp_path):
    raw = tmp_path / "raw"
    curated = tmp_path / "curated"
    ckpt = tmp_path / "ckpt"
    raw.mkdir()
    (raw / "a.json").write_text(bundle([PATIENT]))
    schema = infer_bundle_schema(spark, str(raw))
    incremental_fhir_ingest(spark, str(raw), str(curated), str(ckpt), schema=schema)
    n1 = spark.read.parquet(str(curated / "patient")).count()
    incremental_fhir_ingest(spark, str(raw), str(curated), str(ckpt), schema=schema)
    assert spark.read.parquet(str(curated / "patient")).count() == n1


@pytest.mark.parametrize("window", ["6 hours"])
def test_windowed_counts_stream_equals_batch(spark, tmp_path, window):
    """availableNow stream over the sf0.001 events parquet must produce
    the same finalized windows as the batch aggregation."""
    sf_dir = "/root/testdata/sf0.001"
    batch_events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # materialize with µs timestamps so the stream source sees a plain schema
    src_dir = str(tmp_path / "events_src")
    batch_events.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    agg = windowed_event_counts(stream, window=window, watermark="1 hour")
    run_available_now_to_memory(
        agg, "win_counts", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    expected_df = windowed_event_counts(
        spark.read.parquet(src_dir), window=window, streaming=False
    )
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in expected_df.collect()
    }
    # append mode emits only windows the watermark finalized; the last
    # window(s) may be withheld — everything emitted must match batch, and
    # most windows must have been emitted.
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert expected[k][0] == v[0] and expected[k][1] == pytest.approx(v[1]), k
    assert len(got) >= len(expected) - 5 * 2  # ≤ last window per event_type withheld


def test_cli_batch_and_incremental(spark, tmp_path):
    """__main__ entry point: batch run writes all four tables; a second
    incremental run with a checkpoint only picks up new files."""
    from healthcare_aws_data_engineering_spark.__main__ import main

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "b1.json").write_text(bundle([PATIENT] + OBSERVATIONS))

    curated_b = tmp_path / "curated_batch"
    assert main(["--raw", str(raw), "--curated", str(curated_b)]) == 0
    assert spark.read.parquet(str(curated_b / "observation")).count() == len(
        OBSERVATIONS
    )

    curated_i = tmp_path / "curated_inc"
    ckpt = tmp_path / "ckpt"
    args = ["--raw", str(raw), "--curated", str(curated_i),
            "--incremental", "--checkpoint", str(ckpt)]
    assert main(args) == 0
    n1 = spark.read.parquet(str(curated_i / "observation")).count()
    (raw / "b2.json").write_text(
        bundle([{**OBSERVATIONS[0], "id": "obs-cli-new"}])
    )
    assert main(args) == 0
    assert spark.read.parquet(str(curated_i / "observation")).count() == n1 + 1


def test_stateful_latest_equals_batch(spark, tmp_path):
    """applyInPandasWithState latest-labs: stream the events table in
    THREE micro-batches (maxFilesPerTrigger=1 over three files split by
    event_id) and assert the final per-patient state equals the batch
    max_by((ts, event_id)) pivot — cross-batch state merge, out-of-order
    arrivals, and the (ts, id) tiebreak all pinned at once."""
    from healthcare_aws_data_engineering_spark.streaming.stateful import (
        stateful_latest_labs,
    )

    analytes = ["click", "view", "purchase"]
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = tmp_path / "stream_src"
    for part in range(3):
        ev.filter(F.col("event_id") % 3 == part).write.parquet(
            str(src / f"part{part}")
        )
    schema = spark.read.parquet(str(src / "part0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = stateful_latest_labs(stream, analytes)
    q = (
        out.writeStream.format("memory")
        .queryName("latest_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is None or True  # query drained

    emitted = spark.table("latest_state")
    # multiple micro-batches must actually have run (update rows per batch)
    assert emitted.count() > emitted.select("patient_id").distinct().count()
    # "state so far" = row with max (monotone) n_events per patient
    final = {
        r.patient_id: r
        for r in emitted.withColumn(
            "__rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("patient_id")
                .orderBy(F.col("n_events").desc())
            ),
        )
        .filter("__rn = 1")
        .collect()
    }

    ordk = F.struct(F.col("ts"), F.col("event_id"))
    batch = {
        r.patient_id: r
        for r in ev.groupBy(F.col("user_id").alias("patient_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *[
                F.max_by(
                    F.when(F.col("event_type") == a, F.col("value")),
                    F.when(F.col("event_type") == a, ordk),
                ).alias(a)
                for a in analytes
            ],
        )
        .collect()
    }
    assert set(final) == set(batch)
    for pid, b in batch.items():
        f = final[pid]
        assert f.n_events == b.n_events, pid
        for a in analytes:
            assert getattr(f, a) == getattr(b, a), (pid, a)


def test_session_window_stream_equals_batch_and_sessionize(spark, tmp_path):
    """session_window on an availableNow stream == the batch session_window
    == the independent lag→flag→cumsum sessionizer (three algorithms, one
    semantics)."""
    from healthcare_aws_data_engineering_spark.streaming.windows import (
        session_window_stats,
    )

    sf_dir = "/root/testdata/sf0.001"
    batch_events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src_dir = str(tmp_path / "events_src_sess")
    batch_events.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    agg = session_window_stats(stream, gap="30 minutes", watermark="1 hour")
    run_available_now_to_memory(
        agg, "sess_stats", str(tmp_path / "ckpt_sess"), output_mode="append"
    )
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stats").collect()
    }
    assert got, "stream emitted nothing"

    batch = session_window_stats(
        spark.read.parquet(src_dir), gap="30 minutes", streaming=False
    )
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in batch.collect()
    }
    for k, v in got.items():
        assert expected[k] == v, k
    # append mode may withhold sessions the watermark hasn't closed
    assert len(got) >= len(expected) * 0.8

    # cross-check against the independent batch sessionizer: same number
    # of sessions and same per-session event counts per user
    from healthcare_aws_data_engineering_spark.plans.pipeline_queries import (
        sessionize,
    )

    sess = sessionize(batch_events, gap_ms=30 * 60 * 1000)
    lag_counts = sorted(
        (r.user_id, r.n_events) for r in sess.collect()
    )
    win_counts = sorted((u, n) for (u, _), (_, n) in expected.items())
    assert lag_counts == win_counts


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the identical batch join
    (inner joins emit only watermark-safe matches; everything emitted must
    be in the batch result, and coverage must be substantial)."""
    from healthcare_aws_data_engineering_spark.streaming.windows import (
        correlated_events_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    types = [r.event_type for r in events.select("event_type").distinct().collect()]
    t_first, t_second = sorted(types)[:2]
    src_dir = str(tmp_path / "events_src_join")
    events.write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema

    def stream():
        return spark.readStream.schema(schema).parquet(src_dir)

    joined = correlated_events_join(
        stream().filter(F.col("event_type") == t_first),
        stream().filter(F.col("event_type") == t_second),
        max_gap_minutes=30,
        watermark="1 hour",
    )
    run_available_now_to_memory(
        joined, "ss_join", str(tmp_path / "ckpt_join"), output_mode="append"
    )
    got = {
        (r.first_id, r.second_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    batch = spark.read.parquet(src_dir)
    expected = {
        (r.first_id, r.second_id)
        for r in correlated_events_join(
            batch.filter(F.col("event_type") == t_first),
            batch.filter(F.col("event_type") == t_second),
            max_gap_minutes=30,
            streaming=False,
        ).collect()
    }
    assert got, "stream join emitted nothing"
    assert got <= expected
    assert len(got) >= len(expected) * 0.8


def test_near_dup_stream_equals_batch_and_finds_clones(spark, tmp_path):
    """Stream-static LSH near-dup: an availableNow stream of incoming
    vectors probed against a batch-built index must (a) equal the batch
    run of the same function and (b) flag exact clones of index docs at
    cosine 1.0."""
    import datetime

    from pyspark.sql import functions as F

    from healthcare_aws_data_engineering_spark.streaming.neardup import (
        near_dup_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    index = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(40)
    )
    ts0 = datetime.datetime(2025, 6, 1)
    incoming = (
        index.limit(6)
        .select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
        .withColumn("ts", F.lit(ts0).cast("timestamp"))
    )
    src_dir = str(tmp_path / "incoming")
    incoming.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    out = near_dup_stream(stream, index, threshold=0.99)
    run_available_now_to_memory(out, "near_dup_hits", str(tmp_path / "ckpt"))
    got = {
        (r.doc_id, r.index_id): r.cosine
        for r in spark.sql("SELECT * FROM near_dup_hits").collect()
    }

    expected = {
        (r.doc_id, r.index_id): r.cosine
        for r in near_dup_stream(
            spark.read.parquet(src_dir), index, threshold=0.99
        ).collect()
    }
    assert got == expected
    # every clone is flagged against its source doc at cosine ~1.0
    for vid in [r.vec_id for r in index.limit(6).collect()]:
        assert (vid + 50_000, vid) in got
        assert got[(vid + 50_000, vid)] == pytest.approx(1.0, abs=1e-9)


def test_near_dup_stream_flags_clones_of_singleton_index_docs(spark):
    """Regression pin for the r5 advisor finding: _bucket_cap's >=2
    lower bound is a self-join optimization; applied to the INDEX side
    of the stream-static probe it silently made every bucket-singleton
    index doc unmatchable — an exact clone of a unique corpus doc
    arriving on the stream was never flagged. Wide geometry (16 planes,
    1 band -> 65k buckets for 40 docs) forces near-all index docs to be
    singletons; every clone must still be flagged, and the stream hits
    must equal embedding_near_dup over the union of index+incoming
    restricted to (incoming x index) pairs (identical pinned geometry)."""
    import datetime

    from pyspark.sql import functions as F

    from healthcare_aws_data_engineering_spark.operators.similarity import (
        embedding_near_dup,
        rademacher_planes,
    )
    from healthcare_aws_data_engineering_spark.streaming.neardup import (
        near_dup_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    index = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(40)
    )
    pm = rademacher_planes(16, 64)
    ts0 = datetime.datetime(2025, 6, 1)
    incoming = (
        index.select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
        .withColumn("ts", F.lit(ts0).cast("timestamp"))
    )

    # singletons really are the regime under this geometry
    from healthcare_aws_data_engineering_spark.operators.dedup import _bucket_cap
    from healthcare_aws_data_engineering_spark.operators.similarity import (
        band_keys_from_chunks,
        quantize_vec,
        sig_chunks_q,
    )

    banded = index.select(
        F.col("vec_id"),
        F.posexplode(
            band_keys_from_chunks(
                sig_chunks_q(quantize_vec(F.col("embedding")), pm, 16), 16, 1
            )
        ).alias("band", "band_key"),
    )
    survivors = _bucket_cap(banded, "band_key", 200).count()
    assert survivors < 10, "fixture lost its singleton-heavy regime"

    got = {
        (r.doc_id, r.index_id): r.cosine
        for r in near_dup_stream(
            incoming, index, threshold=0.99, plane_matrix=pm, bands=1
        ).collect()
    }
    # every clone of every index doc — singleton-bucket or not — is hit
    for vid in [r.vec_id for r in index.collect()]:
        assert (vid + 50_000, vid) in got, vid
        assert got[(vid + 50_000, vid)] == pytest.approx(1.0, abs=1e-9)

    union = index.unionByName(incoming.drop("ts"))
    cross = {
        (r.doc_b, r.doc_a): r.cosine
        for r in embedding_near_dup(
            union, threshold=0.99, plane_matrix=pm, bands=1
        ).collect()
        if r.doc_b >= 50_000 and r.doc_a < 50_000
    }
    assert got == cross


def test_windowed_counts_drops_late_rows(spark, tmp_path):
    """The bounded-state trade the windows.py docstring claims, pinned:
    once a window is finalized (watermark passed its end), a late row for
    it is discarded and the window is never re-emitted.

    One subtlety this test encodes deliberately: Spark filters late rows
    with the PREVIOUS micro-batch's watermark while evicting state with
    the current one (SPARK-40925, needed for chained stateful operators).
    A late row arriving in the very next batch after its window crosses
    the watermark can therefore still merge before eviction; the drop
    guarantee holds for rows arriving >=2 batches later. Hence three
    single-file micro-batches (maxFilesPerTrigger=1, mtime-ordered):

    - batch 0 fills the 10:00 window and advances max event time to
      13:00 (watermark '1 hour' -> 12:00);
    - batch 1 is a filler row at 14:00 whose end-of-batch eviction
      finalizes and emits the 10:00 window as (2, 2.0);
    - batch 2 carries the late 10:30 row (value 100, behind the 12:00
      filter watermark -> dropped, no duplicate 10:00 window) plus a
      16:00 row that pushes the watermark past 13:00 and 14:00.
    """
    import datetime as dt
    import os

    def ts(h, m=0):
        return dt.datetime(2026, 1, 1, h, m)

    src_dir = tmp_path / "late_src"
    src_dir.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batches = [
        [(1, ts(10, 0), 1, "x", 1.0), (2, ts(10, 5), 1, "x", 1.0), (3, ts(13, 0), 1, "x", 1.0)],
        [(4, ts(14, 0), 1, "x", 1.0)],
        [(5, ts(10, 30), 1, "x", 100.0), (6, ts(16, 0), 1, "x", 1.0)],
    ]
    # file-source batch order follows modification time; force b0 < b1 < b2
    now = 1_700_000_000
    for i, rows in enumerate(batches):
        d = str(src_dir / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (now + 60 * i, now + 60 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="1 hour")
    run_available_now_to_memory(
        agg, "late_win", str(tmp_path / "late_ckpt"), output_mode="append"
    )
    out = spark.sql("SELECT * FROM late_win").collect()
    rows = {r.window_start.hour: (r.n_events, r.sum_value) for r in out}
    # the 10:00 window finalized with ONLY batch-0 rows: the late 10:30
    # row (value 100) was dropped, not merged and not re-emitted
    assert rows[10] == (2, 2.0)
    assert not any(r.sum_value >= 100.0 for r in out)
    assert sum(1 for r in out if r.window_start.hour == 10) == 1
    # the 13:00 and 14:00 windows finalized once batch 2 advanced the
    # watermark to 15:00; the 16:00 window stays in state, never emitted
    assert rows[13] == (1, 1.0)
    assert rows[14] == (1, 1.0)
    assert 16 not in rows


def test_media_decode_stream_equals_batch(spark, tmp_path):
    """r8: the real-codec decode is a stateless mapInPandas projection,
    so it must run UNCHANGED on an availableNow stream of document
    files — the shape a continuously-ingesting media pipeline has (new
    parquet drops decoded incrementally, no shuffle, no state). Stream
    output must equal the batch run row-for-row."""
    from healthcare_aws_data_engineering_spark.operators import multimodal as M

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(60)
    src_dir = str(tmp_path / "docs_src")
    # two files → two availableNow micro-batches
    docs.repartition(2).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    decoded = M.decode_media_stats(M.encoded_media_from_documents(stream))
    assert decoded.isStreaming
    run_available_now_to_memory(
        decoded, "media_stream", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {
        r.media_id: (r.container, r.n_payload, r.payload_md5, r.byte_mean)
        for r in spark.sql("SELECT * FROM media_stream").collect()
    }
    expected = {
        r.media_id: (r.container, r.n_payload, r.payload_md5, r.byte_mean)
        for r in M.decode_media_stats(
            M.encoded_media_from_documents(spark.read.parquet(src_dir))
        ).collect()
    }
    assert got == expected and len(got) == 60


def test_media_entropy_stream_equals_batch(spark, tmp_path):
    """r9: the entropy/ZCR leg is the same stateless mapInPandas shape
    as the decode leg, so it too must run UNCHANGED on an availableNow
    stream and match the batch run row-for-row (including the float
    entropy — identical bytes through identical code)."""
    from healthcare_aws_data_engineering_spark.operators import multimodal as M

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(45)
    src_dir = str(tmp_path / "docs_src")
    docs.repartition(2).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ent = M.media_entropy(M.encoded_media_from_documents(stream))
    assert ent.isStreaming
    run_available_now_to_memory(
        ent, "media_entropy_stream", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {
        r.media_id: tuple(r)[1:]
        for r in spark.sql("SELECT * FROM media_entropy_stream").collect()
    }
    expected = {
        r.media_id: tuple(r)[1:]
        for r in M.media_entropy(
            M.encoded_media_from_documents(spark.read.parquet(src_dir))
        ).collect()
    }
    assert got == expected and len(got) == 45


def test_dhash_near_dup_stream_equals_batch_and_flags_perturbed(
    spark, tmp_path
):
    """Streaming image near-dup (r11): an availableNow stream of raw
    image containers probed against a batch-built dHash index must
    (a) equal the batch run of the same function and (b) flag every
    one-byte-perturbed clone of an index image (the perturbation moves
    the hash <= 2 bits, well inside max_hamming=6 — the bound pinned by
    test_dhash_one_byte_perturbation_is_near)."""
    import datetime

    from pyspark.sql import functions as F

    from healthcare_aws_data_engineering_spark.operators import (
        multimodal as M,
    )
    from healthcare_aws_data_engineering_spark.streaming.neardup import (
        dhash_near_dup_stream,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(30)
    )
    index_media = M.encoded_media_from_documents(docs).filter(
        F.col("kind") == "image"
    )
    index_hashes = M.media_dhash(index_media).select("media_id", "dhash")

    ts0 = datetime.datetime(2025, 6, 1)
    incoming = (
        M.encoded_media_from_documents(docs, perturb=True)
        .filter(F.col("kind") == "image")
        .select(
            (F.col("media_id") + F.lit(1_000_000_000)).alias("media_id"),
            "content",
        )
        .withColumn("ts", F.lit(ts0).cast("timestamp"))
    )
    src_dir = str(tmp_path / "incoming_media")
    incoming.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    out = dhash_near_dup_stream(stream, index_hashes)
    run_available_now_to_memory(
        out, "dhash_near_dup_hits", str(tmp_path / "ckpt_dhash")
    )
    got = {
        (r.media_id, r.index_id): r.hamming
        for r in spark.sql("SELECT * FROM dhash_near_dup_hits").collect()
    }

    expected = {
        (r.media_id, r.index_id): r.hamming
        for r in dhash_near_dup_stream(
            spark.read.parquet(src_dir), index_hashes
        ).collect()
    }
    assert got == expected
    assert got, "no matches flagged at all"
    # every perturbed clone is flagged against its source image
    for r in index_hashes.select("media_id").collect():
        key = (r.media_id + 1_000_000_000, r.media_id)
        assert key in got, key
        assert got[key] <= 2, (key, got[key])


def test_decontaminate_stream_equals_batch_and_bloom(spark, tmp_path):
    """Streaming decontamination (r12 verdict stretch #8): the bloom
    bitset is a stream-static binary literal, the probe is in-row, and
    only pruned candidates hit the exact-verification join. Three-way
    pin: (a) every row the availableNow stream emits equals the batch
    run of the same function (append mode may withhold docs newer than
    the watermark horizon); (b) the batch run is row-identical to
    bloom_decontaminate on the shared verdict columns for the same
    eval/train bucket split; (c) train-side clones of eval docs are
    flagged contaminated at overlap 1.0."""
    from pyspark.sql import functions as F

    from healthcare_aws_data_engineering_spark.operators.decontam import (
        EVAL_PCT,
        bloom_decontaminate,
        eval_bucket,
    )
    from healthcare_aws_data_engineering_spark.streaming.decontam import (
        decontaminate_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    base = docs.withColumn("bucket", eval_bucket(F.col("doc_id")))
    eval_texts = [
        r.text
        for r in base.filter(F.col("bucket") < EVAL_PCT).limit(3).collect()
    ]
    clones = spark.createDataFrame(
        [(900_000 + i, t) for i, t in enumerate(eval_texts)],
        ["doc_id", "text"],
    )
    universe = docs.union(clones).withColumn(
        "bucket", eval_bucket(F.col("doc_id"))
    )
    eval_docs = universe.filter(F.col("bucket") < EVAL_PCT).select(
        "doc_id", "text"
    )
    train = universe.filter(F.col("bucket") >= EVAL_PCT).select(
        "doc_id", "text"
    )
    clone_train_ids = {
        r.doc_id
        for r in train.filter(F.col("doc_id") >= 900_000).collect()
    }
    assert clone_train_ids, "no clone landed in a train bucket"

    # event times spread one minute apart (~2 hours total) so a
    # 1-minute watermark finalizes all but the newest docs
    src_dir = str(tmp_path / "train_docs")
    train.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1_748_736_000) + (F.col("doc_id") % 1000) * 60
        ),
    ).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    out = decontaminate_stream(stream, eval_docs, watermark="1 minute")
    run_available_now_to_memory(out, "decontam_hits", str(tmp_path / "ckpt"))
    got = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_ratio, r.contaminated)
        for r in spark.sql("SELECT * FROM decontam_hits").collect()
    }

    batch = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_ratio, r.contaminated)
        for r in decontaminate_stream(
            spark.read.parquet(src_dir), eval_docs, watermark="1 minute"
        ).collect()
    }
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])
    # append mode withholds only docs inside the watermark horizon
    assert len(got) >= len(batch) - 15

    bloom = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_ratio, r.contaminated)
        for r in bloom_decontaminate(universe.select("doc_id", "text")).collect()
    }
    assert batch == bloom
    for cid in clone_train_ids:
        n_sh, n_ov, ratio, contaminated = batch[cid]
        assert contaminated and ratio == 1.0 and n_ov == n_sh, batch[cid]
