"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a typed metadata struct
(the reference stores raw blobs in GCS and only metadata in Postgres —
`crawler/services/storage.py:56-71`, `gcs_documents` JSONB in
`current_schema.sql:402`; here the blob IS a column, per SURVEY.md §1.1).

The Spark-side plumbing — schemas, mapInPandas batch shape, partition
behavior — is real and tested. The codec step is STUBBED: this container has
no image/audio libraries, so `decode_image` raises NotImplementedError unless
`fake=True`, which substitutes a deterministic sha-derived "decode" with the
same schema/shape contract. Swap `_fake_decode` for PIL/ffmpeg calls on a
real cluster; nothing else changes.

Scale notes: payloads ride Arrow record batches — cap
`spark.sql.execution.arrow.maxRecordsPerBatch` (and/or pre-repartition by
size) so a batch of blobs fits executor memory; feature extraction is
embarrassingly parallel with NO shuffle (mapInPandas preserves partitioning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("format", T.StringType()),       # png/jpg/mp3/...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata derived JVM-side (no UDF): size + digest; format sniffed
    from magic bytes with built-in expressions."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    fmt = (
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8FF"), "jpg")
        .when(magic.startswith("47494638"), "gif")
        .when(magic.startswith("25504446"), "pdf")
        .otherwise("bin")
    )
    media_type = F.when(fmt.isin("png", "jpg", "gif"), "image").when(
        fmt == "pdf", "document"
    ).otherwise("binary")
    return df.withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            fmt.alias("format"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.sha2(p, 256).alias("sha256"),
        ),
    )


def _fake_decode(doc_id: int, ref: str, payload: bytes, n_features: int) -> dict:
    """Deterministic stand-in decode: dims + feature vector derived from the
    payload digest. Same output contract as a real decoder."""
    d = hashlib.sha256(payload or b"").digest()
    return {
        "doc_id": doc_id,
        "media_ref": ref,
        "width": 64 + d[0] % 192,
        "height": 64 + d[1] % 192,
        "n_channels": 3,
        "features": [((d[i % 32] * 31 + i) % 256) / 255.0 for i in range(n_features)],
    }


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    ref_col: str = "media_ref",
    n_features: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (one pass, no shuffle).

    fake=False raises NotImplementedError at executor time — the real codec
    (PIL / torchvision / ffmpeg) is not available in this container.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg; "
                    "run with fake=True for the deterministic stand-in"
                )
            rows = [
                _fake_decode(r[id_col], r[ref_col], r[payload_col], n_features)
                for r in pdf.to_dict("records")
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)


def resize_media(
    decoded: DataFrame, target: int = 64, fake: bool = False
) -> DataFrame:
    """Image-resize plumbing over decoded rows: aspect-preserving fit into a
    target x target box (longest edge -> target, floor, min 1). The pixel
    resample itself is the stubbed codec step (PIL on a real cluster); the
    dimension arithmetic, batch shape, and schema are real. mapInPandas,
    shuffle-free."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resample needs PIL/cv2 (not in this container); "
                    "run with fake=True for the arithmetic-only contract"
                )
            longest = pdf[["width", "height"]].max(axis=1)
            out_w = (pdf["width"] * target // longest).clip(lower=1).astype("int32")
            out_h = (pdf["height"] * target // longest).clip(lower=1).astype("int32")
            out = pdf[["doc_id", "media_ref", "width", "height"]].copy()
            out["out_width"] = out_w
            out["out_height"] = out_h
            yield out

    return decoded.mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plumbing: explode a per-row frame index sequence
    (0, n, 2n, ...) — the decode of each sampled frame is the stubbed step.
    Frame count is metadata-driven (here: derived from payload size)."""
    n_frames = (F.col("media_meta.n_bytes") % 300 + 30).cast("int")
    return df.select(
        id_col,
        "media_meta",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
