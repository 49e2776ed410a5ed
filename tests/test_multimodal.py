"""Multimodal operator tests: the codec is a deterministic stub, so these
pin the REAL parts — schemas, meta propagation, Arrow batch plumbing,
1→N frame fan-out, early binary-drop — plus stub determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from healthcare_aws_data_engineering_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"document body {i} " * (i + 1), lang="en",
                source="s", n_chars=0)
            for i in range(9)
        ]
    )
    return M.media_from_documents(docs)


def test_media_schema(media):
    # simpleString: equality up to nullability flags
    assert media.schema.simpleString() == M.MEDIA_SCHEMA.simpleString()
    kinds = {r.media_id % 3: r.kind for r in media.collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video"}


def test_media_features_shape_and_determinism(spark, media):
    out = M.media_features(media, dim=16)
    assert "content" not in out.columns  # binary dropped before downstream
    rows1 = {r.media_id: r.features for r in out.collect()}
    rows2 = {r.media_id: r.features for r in M.media_features(media, dim=16).collect()}
    assert rows1 == rows2  # stub codec is deterministic
    for v in rows1.values():
        assert len(v) == 16 and all(0.0 <= x < 1.0 for x in v)
    # meta survives the mapInPandas round-trip
    metas = {r.media_id: r.meta for r in out.collect()}
    assert metas[0].sample_rate == 16000


def test_media_features_keep_content(media):
    out = M.media_features(media, dim=4, keep_content=True)
    assert "content" in out.columns


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M._decode_bytes(b"x", 4, deterministic_fake=False)


def test_resize_updates_meta_only_for_images(spark, media):
    out = {r.media_id: r for r in M.resize_images(media, 8, 8).collect()}
    orig = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        if r.kind == "image":
            assert r.meta.width == 8 and r.meta.height == 8
            assert r.content != orig[mid].content
        else:
            assert r.meta == orig[mid].meta
            assert r.content == orig[mid].content


def test_sample_frames_fanout(spark, media):
    frames = M.sample_frames(media, every_ms=100, max_frames=5).collect()
    vids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {f.media_id for f in frames} == vids
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f.media_id, []).append(f)
    for mid, fs in by_vid.items():
        assert len(fs) <= 5
        assert sorted(f.frame_idx for f in fs) == list(range(len(fs)))
        assert all(f.frame_ms == f.frame_idx * 100 for f in fs)
        assert len({bytes(f.frame) for f in fs}) == len(fs)  # distinct frames


def test_media_stats_pure_projection(spark, media):
    stats = {r.media_id: r for r in M.media_stats(media).collect()}
    raw = {r.media_id: r for r in media.collect()}
    for mid, s in stats.items():
        assert s.n_bytes == len(bytes(raw[mid].content))
        assert s.n_pixels == s.width * s.height
