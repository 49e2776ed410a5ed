"""Multimodal (image/audio/video) column operators.

EXTENSION beyond the reference (training-data pipeline surface): media
travel as opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

The actual codec step is STUBBED: image/audio libraries are not available
in this environment, so ``_decode_bytes`` raises ``NotImplementedError``
unless ``deterministic_fake=True``, which derives stable pseudo-content
from the bytes themselves (md5-seeded with ASCII salts — md5 is the one
hash every engine shares, so the DuckDB oracle can replay the fake codec
end-to-end and the driver's value-hash check covers these paths too).
Everything AROUND the codec — schemas, meta propagation, Arrow batch
shapes, multi-row fan-out for frame sampling, partition sizing — is real
and tested; swapping in Pillow/ffmpeg means replacing ``_decode_bytes``
only.

Scale design:
- media rows are large (MBs): keep ``spark.sql.files.maxPartitionBytes``
  and ``maxRecordsPerBatch`` sized so an Arrow batch of decoded frames
  fits executor memory; operators here never collect or shuffle binary
  content except the explicit repartition helper;
- feature extraction emits fixed-width vectors (array<float>) — the heavy
  binary column is DROPPED as early as the pipeline allows (`keep_content=
  False` defaults) so downstream joins/aggs shuffle only features;
- frame sampling fans out rows inside ``mapInPandas`` (no explode of
  pre-materialized arrays — frames are produced batch-local and never all
  in memory for a whole file at once).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media corpus from the documents table: the UTF-8 text
    bytes stand in for encoded media; meta fields derived from doc stats.
    Exists so multimodal plumbing runs against driver testdata."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def _decode_bytes(content: bytes, n: int, deterministic_fake: bool) -> list[float]:
    """STUB codec: real decode needs PIL/ffmpeg (absent here).

    deterministic_fake=True → n floats in [0,1): feature k is the first
    48 bits of md5(content + "#feat:k") divided by 2^48 — 48 bits keep
    the integer exact in a double and the divisor is a power of two, so
    the value is bit-identical in Python, Spark, and the DuckDB oracle
    (``('0x' || substr(md5(...), 1, 12))::BIGINT / 2^48``)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires an image/audio codec; install one and "
            "replace _decode_bytes (deterministic_fake=True for testing)"
        )
    seed = content or b""
    return [
        int(hashlib.md5(seed + f"#feat:{k}".encode()).hexdigest()[:12], 16)
        / 2**48
        for k in range(n)
    ]


def media_features(
    media: DataFrame,
    dim: int = 16,
    keep_content: bool = False,
    deterministic_fake: bool = True,
) -> DataFrame:
    """media → fixed-width feature vector per row (the decode+embed stage).

    mapInPandas: one Arrow batch in, one out; the binary column is dropped
    from the OUTPUT schema by default so only (ids, meta, features) flow
    downstream."""
    import pandas as pd

    fields = [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("meta", MEDIA_META),
        StructField("features", ArrayType(FloatType())),
    ]
    if keep_content:
        fields.insert(2, StructField("content", BinaryType()))
    out_schema = StructType(fields)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(c, dim, deterministic_fake)
                for c in pdf["content"]
            ]
            cols = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "meta": pdf["meta"],
                "features": feats,
            }
            if keep_content:
                cols["content"] = pdf["content"]
            yield pd.DataFrame(cols)[[f.name for f in out_schema.fields]]

    return media.mapInPandas(extract, schema=out_schema)


def resize_images(
    media: DataFrame, width: int, height: int, deterministic_fake: bool = True
) -> DataFrame:
    """Stub resize: content re-derived at the target size, meta updated.
    Non-image rows pass through unchanged."""
    import pandas as pd

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def resize_row(kind, content, meta):
                if kind != "image":
                    return content, meta
                vals = _decode_bytes(content, 8, deterministic_fake)  # "pixels"
                out = hashlib.md5(
                    bytes(bytearray(int(v * 255) for v in vals))
                    + f"#resize:{width}x{height}".encode()
                ).digest()
                meta = dict(meta or {})
                meta["width"], meta["height"] = width, height
                return out, meta

            # zip over column Series, not iterrows — no per-row Series
            # construction inside the Arrow batch loop
            res = [
                resize_row(k, c, m)
                for k, c, m in zip(pdf["kind"], pdf["content"], pdf["meta"])
            ]
            pdf = pdf.copy()
            pdf["content"] = [r[0] for r in res]
            pdf["meta"] = [r[1] for r in res]
            yield pdf

    return media.mapInPandas(do, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Video → one row per sampled frame (1→N fan-out inside mapInPandas;
    frames for a batch are produced incrementally, never one whole video's
    frames held as a single array value)."""
    import pandas as pd

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, frames = [], [], [], []
            # zip over column Series, not iterrows (per-row Series cost)
            for media_id, kind, content, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                dur = (meta or {}).get("duration_ms") or 0
                n = min(max_frames, max(1, dur // every_ms))
                for i in range(int(n)):
                    ids.append(media_id)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    # md5 + ASCII salt (not raw-byte salts): the DuckDB
                    # oracle rebuilds this as md5(text || '#frame:' || i)
                    frames.append(
                        hashlib.md5(
                            (content or b"") + f"#frame:{i}".encode()
                        ).digest()
                        if deterministic_fake
                        else _decode_bytes(content, 1, False)  # raises
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ms": mss, "frame": frames}
            )

    return media.mapInPandas(do, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata/stats projection over the binary column (no UDF):
    sizes, content hash, meta fields — the cheap pre-filter stage before
    any decode (drop corrupt/empty/oversized media early, scan-fused)."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
        (F.col("meta.width") * F.col("meta.height")).alias("n_pixels"),
    )
