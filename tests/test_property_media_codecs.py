"""Hypothesis round-trip properties for the r8 pure-Python media codecs
(operators/media_codecs.py) — no Spark session needed, so the shrink
loop is cheap. The codecs are new code on the real-bytes path; these
pin encode∘decode = identity over the whole parameter space (every BMP
padding residue, odd PPM dims, empty-ish WAV payloads) rather than the
fixture grid the driver corpus happens to produce.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from healthcare_aws_data_engineering_spark.operators import media_codecs as C

SETTINGS = settings(max_examples=200, deadline=None)

dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@SETTINGS
@given(wh=dims, data=st.data())
def test_ppm_round_trip(wh, data):
    w, h = wh
    rgb = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
        )
    )
    d = C.decode_media(C.encode_ppm(w, h, rgb))
    assert (d.format, d.width, d.height, d.sample_rate) == ("ppm", w, h, None)
    assert d.payload == rgb


@SETTINGS
@given(wh=dims, data=st.data())
def test_bmp_round_trip_and_storage_shape(wh, data):
    w, h = wh
    rgb = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
        )
    )
    enc = C.encode_bmp(w, h, rgb)
    # structural invariants independent of the decoder
    row, pad = w * 3, (-w * 3) % 4
    assert len(enc) == 54 + (row + pad) * h
    assert struct.unpack_from("<I", enc, 10)[0] == 54
    # first stored row is the LAST logical row (bottom-up storage)
    assert enc[54 : 54 + row] == rgb[(h - 1) * row : h * row]
    d = C.decode_media(enc)
    assert (d.format, d.width, d.height) == ("bmp", w, h)
    assert d.payload == rgb


@SETTINGS
@given(
    rate=st.integers(1, 384_000),
    n_samples=st.integers(1, 600),
    data=st.data(),
)
def test_wav_round_trip(rate, n_samples, data):
    pcm = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=2 * n_samples, max_size=2 * n_samples
            )
        )
    )
    d = C.decode_media(C.encode_wav(rate, pcm))
    assert (d.format, d.sample_rate) == ("wav", rate)
    assert (d.width, d.height) == (None, None)
    assert d.payload == pcm


@SETTINGS
@given(
    junk=st.one_of(
        st.binary(min_size=0, max_size=64),
        # force the interesting magic prefixes: truncated/corrupt
        # headers must raise ValueError, not struct.error/IndexError
        st.tuples(
            st.sampled_from([b"P6", b"BM", b"RIFF", b"RIFF1234WAVE"]),
            st.binary(min_size=0, max_size=64),
        ).map(lambda t: t[0] + t[1]),
    )
)
def test_decode_media_never_misdispatches_junk(junk):
    """Arbitrary bytes either decode as the container their magic claims
    or raise ValueError — never a wrong-format result, never a non-
    ValueError crash (IndexError/struct.error would mean an unguarded
    offset read)."""
    try:
        d = C.decode_media(junk)
    except ValueError:
        return
    assert d.format in ("ppm", "bmp", "wav")
    magic = {b"P6": "ppm", b"BM": "bmp", b"RI": "wav"}
    assert d.format == magic[junk[:2]]


# ---------------------------------------------------------------------------
# degenerate-payload guards (r9 advice): empty/odd payloads must be
# rejected at the header, not crash the downstream stats stages with
# ZeroDivisionError / struct.error
# ---------------------------------------------------------------------------

import pytest


def _wav_with_data_chunk(size: int, body: bytes) -> bytes:
    """Hand-rolled RIFF with an arbitrary declared data-chunk size."""
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    payload = (
        struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", size)
        + body
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(payload), b"WAVE") + payload


def test_wav_zero_size_data_chunk_rejected():
    with pytest.raises(ValueError, match="positive even size"):
        C.decode_media(_wav_with_data_chunk(0, b""))


def test_wav_odd_size_data_chunk_rejected():
    with pytest.raises(ValueError, match="positive even size"):
        C.decode_media(_wav_with_data_chunk(3, b"abc\x00"))  # +pad byte


def test_wav_truncated_data_chunk_rejected():
    with pytest.raises(ValueError, match="truncated"):
        C.decode_media(_wav_with_data_chunk(100, b"ab"))


def _bmp_with_dims(width: int, height: int) -> bytes:
    file_header = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0
    )
    return file_header + info_header


@pytest.mark.parametrize("w,h", [(0, 4), (-3, 4), (4, 0), (0, 0)])
def test_bmp_degenerate_dims_rejected(w, h):
    with pytest.raises(ValueError, match="dimensions must be positive"):
        C.decode_media(_bmp_with_dims(w, h))


def test_bmp_negative_height_still_means_topdown():
    # height < 0 is the legal top-down flag, NOT a degenerate dim
    rgb = bytes(range(2 * 2 * 3))
    enc = bytearray(C.encode_bmp(2, 2, rgb))
    h = struct.unpack_from("<i", enc, 22)[0]
    struct.pack_into("<i", enc, 22, -h)
    # stored rows were bottom-up for +h; flag says top-down now, so the
    # decoder must return them in STORED order (i.e. logically flipped)
    d = C.decode_media(bytes(enc))
    assert (d.width, d.height) == (2, 2)
    row = 2 * 3
    assert d.payload == rgb[row:] + rgb[:row]


@pytest.mark.parametrize("w,h", [(0, 4), (4, 0)])
def test_ppm_degenerate_dims_rejected(w, h):
    with pytest.raises(ValueError, match="dimensions must be positive"):
        C.decode_media(f"P6\n{w} {h}\n255\n".encode())


# ---------------------------------------------------------------------------
# dHash invariants (r9): gradient hashes must be brightness-invariant
# and deterministic over the whole dimension space — the property that
# makes them a PERCEPTUAL dedup key rather than a byte hash
# ---------------------------------------------------------------------------

from healthcare_aws_data_engineering_spark.operators.multimodal import (
    dhash_bytes,
)

img_dims = st.tuples(st.integers(1, 20), st.integers(1, 20))


@SETTINGS
@given(wh=img_dims, data=st.data(), shift=st.integers(1, 40))
def test_dhash_brightness_invariance(wh, data, shift):
    """Adding a constant to every channel (clamp-free by construction:
    bytes drawn from [0, 255-shift]) preserves every gray comparison,
    hence the hash — the defining perceptual property."""
    w, h = wh
    payload = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255 - shift),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    shifted = bytes(b + shift for b in payload)
    assert dhash_bytes(payload, w, h) == dhash_bytes(shifted, w, h)


@SETTINGS
@given(wh=img_dims, data=st.data())
def test_dhash_shape_and_determinism(wh, data):
    """16 lowercase hex chars for EVERY dimension pair (including
    degenerate 1x1, where all grid points alias one pixel and the hash
    is all-zero), and byte-identical on repeat."""
    w, h = wh
    payload = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
        )
    )
    hx = dhash_bytes(payload, w, h)
    assert len(hx) == 16 and all(c in "0123456789abcdef" for c in hx)
    assert hx == dhash_bytes(payload, w, h)
    if w == 1 and h == 1:
        assert hx == "00" * 8  # one pixel: no gradient can be strict


@given(st.integers(min_value=-4, max_value=20))
def test_derive_dhash_bands_contract(mh):
    """Property pin of the r11 recall contract: for every coverable
    max_hamming the derived band count divides 16, strictly exceeds
    max_hamming (pigeonhole), and is MINIMAL among such divisors (more
    bands = smaller band values = more candidate collisions for free);
    uncoverable values raise instead of silently degrading recall."""
    import pytest

    from healthcare_aws_data_engineering_spark.operators.multimodal import (
        derive_dhash_bands,
    )

    if 0 <= mh < 16:
        b = derive_dhash_bands(mh, None)
        assert 16 % b == 0 and mh < b
        assert all(d <= mh for d in (1, 2, 4, 8, 16) if d < b)
        # pinned values obey the same guarantee or refuse
        assert derive_dhash_bands(mh, b) == b
        if mh > 0:
            smaller = max(d for d in (1, 2, 4, 8, 16) if d <= mh)
            with pytest.raises(ValueError):
                derive_dhash_bands(mh, smaller)
    else:
        with pytest.raises(ValueError):
            derive_dhash_bands(mh, None)
