"""Pure-Python decoders for uncompressed media containers (PPM / BMP / WAV).

The real-bytes leg of the multimodal family (r7 verdict ask #4): the
container formats every codec library bottoms out in that need NO
external dependency — binary PPM (P6), 24-bpp uncompressed bottom-up
BMP, and 16-bit PCM RIFF/WAV — decoded with ``struct`` alone. This is
what replaces the former ``NotImplementedError`` branch of
``multimodal._decode_bytes``: real header parsing, real row un-padding /
vertical flip (BMP), real byte→sample interpretation, running inside the
same Arrow-batched ``mapInPandas`` stage as the md5-fake codec.

Scope is deliberately the UNCOMPRESSED containers: JPEG/PNG/MP3 &c.
require entropy decoders that are a library's job, not an analytics
engine's — ``decode_media`` raises ``ValueError`` on unknown magic
rather than pretending. Swapping in Pillow/ffmpeg remains a one-function
replacement, exactly as before, but the plumbing has now carried REAL
bytes end-to-end.

Decoded payloads are returned in LOGICAL order: BMP pixel rows are
flipped back to top-down and stripped of their 4-byte row padding, so
``payload`` is byte-identical to what the encoder was handed — the
round-trip an oracle can verify with one md5.

Encoders for the same three containers live here too; they exist so unit
tests can cross-check the JVM-expression encoder in
``multimodal.encoded_media_from_documents`` byte-for-byte, and so the
decoders are testable without Spark.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class DecodedMedia:
    """Decode result: parsed header facts + the logical payload bytes."""

    format: str  # 'ppm' | 'bmp' | 'wav'
    width: int | None
    height: int | None
    sample_rate: int | None
    payload: bytes


# --------------------------------------------------------------------------
# PPM (binary P6): ASCII header "P6\n<w> <h>\n<maxval>\n", raw RGB payload
# --------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"PPM payload must be w*h*3={width * height * 3} bytes")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def decode_ppm(data: bytes) -> DecodedMedia:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) file")
    # header tokens: magic, width, height, maxval — whitespace-separated,
    # '#' comment lines allowed; payload starts after the single
    # whitespace byte that terminates maxval.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # the single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    if width < 1 or height < 1:
        # degenerate dims would decode to an empty payload, which the
        # downstream stats stages (mean = sum/len) cannot divide by
        raise ValueError(f"PPM dimensions must be positive (w={width}, h={height})")
    n = width * height * 3
    payload = data[pos : pos + n]
    if len(payload) != n:
        raise ValueError(f"PPM truncated: want {n} payload bytes, have {len(payload)}")
    return DecodedMedia("ppm", width, height, None, payload)


# --------------------------------------------------------------------------
# BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, uncompressed,
# bottom-up rows padded to 4-byte boundaries
# --------------------------------------------------------------------------

_BMP_ROW_PAD = 4


def _bmp_row_bytes(width: int) -> tuple[int, int]:
    row = width * 3
    pad = (-row) % _BMP_ROW_PAD
    return row, pad


def encode_bmp(width: int, height: int, rgb_topdown: bytes) -> bytes:
    """24-bpp BMP from TOP-DOWN unpadded pixel bytes (stored bottom-up +
    padded, per the format)."""
    if len(rgb_topdown) != width * height * 3:
        raise ValueError(f"BMP payload must be w*h*3={width * height * 3} bytes")
    row, pad = _bmp_row_bytes(width)
    image_size = (row + pad) * height
    file_header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = [
        rgb_topdown[r * row : (r + 1) * row] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    ]
    return file_header + info_header + b"".join(rows)


def decode_bmp(data: bytes) -> DecodedMedia:
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    if len(data) < 54:
        raise ValueError("BMP truncated: header is 54 bytes")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if header_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bpp BMP supported "
            f"(header={header_size}, planes={planes}, bpp={bpp}, comp={compression})"
        )
    topdown = height < 0  # negative height = rows already top-down
    height = abs(height)
    if width < 1 or height < 1:
        # width<=0 would otherwise yield an empty payload (w=0) or a
        # misleading "BMP truncated" (w<0, negative row size); height==0
        # is the same empty-payload degenerate. Reject at the header.
        raise ValueError(f"BMP dimensions must be positive (w={width}, h={height})")
    row, pad = _bmp_row_bytes(width)
    stored = data[offset : offset + (row + pad) * height]
    if len(stored) != (row + pad) * height:
        raise ValueError("BMP truncated")
    stride = row + pad
    rows = [stored[r * stride : r * stride + row] for r in range(height)]
    if not topdown:
        rows.reverse()  # bottom-up on disk → logical top-down
    return DecodedMedia("bmp", width, height, None, b"".join(rows))


# --------------------------------------------------------------------------
# WAV: RIFF container, PCM (format 1), 16-bit mono
# --------------------------------------------------------------------------


def encode_wav(sample_rate: int, pcm16: bytes) -> bytes:
    if len(pcm16) % 2:
        raise ValueError("PCM16 payload must be an even number of bytes")
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm16), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(pcm16))
        + pcm16
    )


def decode_wav(data: bytes) -> DecodedMedia:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sample_rate, payload = 12, None, None
    while pos + 8 <= len(data):
        chunk_id, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 mono supported "
                    f"(fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
            sample_rate = rate
        elif chunk_id == b"data":
            if len(body) != size:
                raise ValueError(
                    f"WAV truncated: data chunk declares {size} bytes, "
                    f"have {len(body)}"
                )
            payload = body
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if sample_rate is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(payload) == 0 or len(payload) % 2:
        # PCM16 frames are 2 bytes each; a zero-size or odd-size data
        # chunk would crash the sample-unpack stage (struct.unpack
        # '<{n}h') or the RMS division instead of raising here
        raise ValueError(
            f"WAV PCM16 data chunk must be a positive even size "
            f"(got {len(payload)})"
        )
    return DecodedMedia("wav", None, None, sample_rate, payload)


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def decode_media(data: bytes) -> DecodedMedia:
    """Sniff the container by magic bytes and decode. Raises ValueError on
    anything that needs a real codec library (JPEG/PNG/MP3/...)."""
    if not data:
        raise ValueError("empty media content")
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:4] == b"RIFF":
        return decode_wav(data)
    raise ValueError(
        f"unsupported container (magic {data[:4]!r}); compressed formats "
        f"need an external codec library"
    )
