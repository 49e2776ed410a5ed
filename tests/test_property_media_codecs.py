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
