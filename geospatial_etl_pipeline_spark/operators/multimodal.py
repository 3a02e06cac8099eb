"""Multimodal column plumbing (SURVEY §2j [EXT], driver north star).

Media rides as opaque ``binary`` columns with a typed metadata struct —
the only schema that scales to 100 TB of images/audio/video in a
relational engine (content-addressed blobs, columnar metadata, operators
as Arrow-batched transforms).

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS: ``decode_image`` raises NotImplementedError unless
``allow_fake=True``, in which case a clearly-marked deterministic fake
decoder (bytes -> pseudo-pixel stats via MD5) exercises the real Spark
plumbing — schema, batch iteration, partition sizing — end to end.
Swap ``_fake_decode`` for Pillow/ffmpeg calls to go live.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("blob", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("features", ArrayType(DoubleType(), False), False),
    ]
)


def synthesize_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test fixture: deterministic binary blobs derived from documents
    (doc text bytes repeated) with plausible metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.repeat(F.col("text"), 3), "utf-8").alias("blob"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(blob: bytes, dims: int = 8) -> np.ndarray:
    """FAKE decode kernel: MD5-chained bytes -> `dims` doubles in [0,1).
    Deterministic, codec-free; stands in for pixel/sample statistics."""
    h = hashlib.md5(blob).digest()
    vals = []
    while len(vals) < dims:
        vals.extend(b / 256.0 for b in h)
        h = hashlib.md5(h).digest()
    return np.asarray(vals[:dims], dtype=np.float64)


def decode_features(
    media: DataFrame, dims: int = 8, allow_fake: bool = False
) -> DataFrame:
    """Decode + feature-extract each blob into a fixed-length vector.

    Real codecs are unavailable in this image: pass ``allow_fake=True``
    to run the deterministic fake kernel through the production plumbing
    (Arrow batches, explicit schema, per-partition streaming).
    """
    if not allow_fake:
        raise NotImplementedError(
            "media codecs (Pillow/ffmpeg) are not available in this "
            "environment; pass allow_fake=True to run the deterministic "
            "fake decode kernel through the real Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(b, dims) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "content_hash": [
                        hashlib.md5(b).hexdigest() for b in pdf["blob"]
                    ],
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator boundary — stub (no codec). The signature,
    schema and partition behavior are the production shape."""
    raise NotImplementedError(
        "resize requires an image codec; the operator contract is "
        "media(MEDIA_SCHEMA) -> media(MEDIA_SCHEMA) with meta.width/height "
        "rewritten and blob re-encoded, applied via mapInPandas"
    )


def frame_sample_stub(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling operator boundary — stub (no codec). Contract:
    one output row per sampled frame (media_id, frame_idx, ts_ms, blob)."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg; contract documented in docstring"
    )
