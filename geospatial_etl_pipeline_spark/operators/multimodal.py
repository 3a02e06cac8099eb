"""Multimodal column plumbing (SURVEY §2j [EXT], driver north star).

Media rides as opaque ``binary`` columns with a typed metadata struct —
the only schema that scales to 100 TB of images/audio/video in a
relational engine (content-addressed blobs, columnar metadata, operators
as Arrow-batched transforms).

The image/audio codec libraries are NOT in this container, so ONLY the
byte<->pixel codec boundary is faked (clearly-marked deterministic fake
containers, ``allow_fake=True`` required): feature extraction, the
nearest-neighbor ``resize`` math, ``frame_sample`` timestamp
arithmetic, and all Spark plumbing — schema, Arrow batch iteration,
per-frame fan-out, partition sizing — are real and tested end to end.
Swap the fake_*code_* functions for Pillow/ffmpeg calls to go live.
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


# --------------------------------------------------------------------------
# Pluggable pixel codec. ONLY the byte<->pixel codec is fake (no
# Pillow/ffmpeg in this image); everything downstream of decode —
# nearest-neighbor resize indexing, frame timestamp arithmetic, the
# Spark plumbing — is the real production math and runs unchanged when
# the codec swaps to Pillow/ffmpeg.
# --------------------------------------------------------------------------

_FAKEIMG = b"FIMG"  # fake image container: magic + <HH> h,w + uint8 pixels
_FAKEVID = b"FVID"  # fake video: magic + <IHHI> n_frames,h,w,frame_ms + frames


def fake_encode_image(arr: np.ndarray) -> bytes:
    """FAKE image encoder (grayscale uint8). Round-trips with
    :func:`fake_decode_image`, so codec→math→codec compositions are
    testable end to end."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    return _FAKEIMG + struct.pack("<HH", h, w) + a.tobytes()


def fake_decode_image(blob: bytes, meta_w: int | None = None,
                      meta_h: int | None = None) -> np.ndarray:
    """FAKE image decoder: parses the FIMG container; for arbitrary
    bytes (e.g. synthesize_media fixtures) deterministically tiles the
    raw bytes into the metadata's (h, w) shape — codec-free pixels that
    still exercise real array math downstream."""
    import struct

    if blob[:4] == _FAKEIMG:
        h, w = struct.unpack_from("<HH", blob, 4)
        return np.frombuffer(blob, dtype=np.uint8, count=h * w,
                             offset=8).reshape(h, w)
    if not meta_w or not meta_h:
        raise ValueError("raw blob needs meta width/height to shape pixels")
    raw = np.frombuffer(blob, dtype=np.uint8)
    reps = -(-(meta_h * meta_w) // max(len(raw), 1))
    return np.tile(raw, reps)[: meta_h * meta_w].reshape(meta_h, meta_w)


def fake_encode_video(frames: np.ndarray, frame_ms: int) -> bytes:
    """FAKE video encoder: (n, h, w) uint8 frames at a fixed frame
    interval."""
    import struct

    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return _FAKEVID + struct.pack("<IHHI", n, h, w, frame_ms) + f.tobytes()


def fake_decode_video(blob: bytes) -> tuple[np.ndarray, int]:
    import struct

    if blob[:4] != _FAKEVID:
        raise ValueError("not a FVID container")
    n, h, w, frame_ms = struct.unpack_from("<IHHI", blob, 4)
    frames = np.frombuffer(blob, dtype=np.uint8, count=n * h * w,
                           offset=16).reshape(n, h, w)
    return frames, frame_ms


def _nn_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """REAL nearest-neighbor resize (the math is identical under any
    codec): source index = floor((i + 0.5) * src/dst)."""
    in_h, in_w = arr.shape
    rows = np.minimum(
        ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1
    )
    cols = np.minimum(
        ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64), in_w - 1
    )
    return arr[np.ix_(rows, cols)]


def resize(
    media: DataFrame, width: int, height: int, allow_fake: bool = False
) -> DataFrame:
    """Image resize: media(MEDIA_SCHEMA) -> media(MEDIA_SCHEMA) with
    meta.width/height rewritten and the blob re-encoded at the target
    size. Nearest-neighbor sampling (real math); decode/encode go
    through the pluggable codec — ``allow_fake=True`` runs the
    deterministic fake codec (this image has no Pillow), a production
    deploy swaps in a real one with zero plan changes. Arrow-batched
    ``mapInPandas``: one task per partition of blobs, no driver work."""
    if not allow_fake:
        raise NotImplementedError(
            "image codecs (Pillow) are not available in this environment; "
            "pass allow_fake=True to run the deterministic fake codec "
            "through the real resize math and Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                meta = row["meta"]
                arr = fake_decode_image(
                    row["blob"], meta.get("width"), meta.get("height")
                )
                resized = _nn_resize(arr, width, height)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "blob": fake_encode_image(resized),
                        "meta": {
                            "mime": "image/x-fake",
                            "width": width,
                            "height": height,
                            "duration_ms": meta.get("duration_ms"),
                        },
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("blob", BinaryType(), False),
    ]
)


def frame_sample(
    media: DataFrame, every_ms: int, allow_fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_ms, blob=encoded frame image), sampling at
    t = 0, every_ms, 2*every_ms, … < duration; frame_idx = t // the
    stream's frame interval. The timestamp arithmetic is the real
    operator; only the byte<->frame codec is fake (no ffmpeg here) —
    swap it for a real demuxer with no change to the Spark shape (the
    per-row fan-out to N frame rows is the part that matters at scale:
    it happens inside the executor batch, never on the driver)."""
    if not allow_fake:
        raise NotImplementedError(
            "video codecs (ffmpeg) are not available in this environment; "
            "pass allow_fake=True to run the deterministic fake codec "
            "through the real sampling math and Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                frames, frame_ms = fake_decode_video(row["blob"])
                duration = len(frames) * frame_ms
                ts = 0
                while ts < duration:
                    idx = ts // frame_ms
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": int(idx),
                            "ts_ms": int(ts),
                            "blob": fake_encode_image(frames[idx]),
                        }
                    )
                    ts += every_ms
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "ts_ms", "blob"],
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def synthesize_videos(
    docs: DataFrame, n_frames: int = 12, frame_ms: int = 100,
    h: int = 6, w: int = 8,
) -> DataFrame:
    """Test fixture: deterministic fake-video blobs derived from doc_id
    (frame k pixel (r,c) = (doc_id*7 + k*5 + r*3 + c) % 251)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                k = np.arange(n_frames)[:, None, None]
                r = np.arange(h)[None, :, None]
                c = np.arange(w)[None, None, :]
                frames = ((int(did) * 7 + k * 5 + r * 3 + c) % 251).astype(
                    np.uint8
                )
                out.append(
                    {
                        "media_id": int(did),
                        "kind": "video",
                        "blob": fake_encode_video(frames, frame_ms),
                        "meta": {
                            "mime": "video/x-fake",
                            "width": w,
                            "height": h,
                            "duration_ms": n_frames * frame_ms,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("ahash", LongType(), False),
    ]
)


def ahash64(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """64-bit average-hash (aHash) per media blob: decode → 8×8
    nearest-neighbor downscale (REAL math) → threshold at the mean →
    bit-packed signature. The perceptual fingerprint that survives
    re-encoding/resizing, where content_hash (exact bytes) does not —
    the image-dedup analogue of MinHash for text.

    The byte→pixel step is the pluggable fake codec (``allow_fake``,
    same contract as decode_features); everything after it is
    production math. Arrow-batched mapInPandas; blobs never leave the
    executor.

    IMAGE rows only: non-image kinds are filtered out up front (a
    video container tiled through the image decoder would hash to
    silent garbage, and audio rows have no pixel dims to shape — the
    frame-sampling path is the video analogue)."""
    if not allow_fake:
        raise NotImplementedError(
            "media codecs (Pillow/ffmpeg) are not available in this "
            "environment; pass allow_fake=True to run the deterministic "
            "fake decode kernel through the real Spark plumbing"
        )

    media = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, blob, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["blob"], pdf["meta"]
            ):
                px = fake_decode_image(
                    bytes(blob), meta["width"], meta["height"]
                )
                small = _nn_resize(px, 8, 8).astype(np.int64)
                bits = (small >= small.mean()).flatten()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                # two's-complement into signed 64-bit for a Spark LONG
                if h >= 1 << 63:
                    h -= 1 << 64
                out.append((int(mid), kind, h))
            yield pd.DataFrame(out, columns=["media_id", "kind", "ahash"])

    return media.mapInPandas(run, AHASH_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Near-duplicate media pairs by banded Hamming join: the 64-bit
    signature splits into ``bands`` exact-match bands; by pigeonhole
    any pair within Hamming distance ``bands − 1`` shares at least one
    band, so a (band_idx, band_value) equi-join generates ALL such
    candidates (guaranteed recall for max_hamming ≤ bands − 1, the
    same guarantee structure as MinHash banding) and ``bit_count(xor)``
    verifies exactly. Never an all-pairs comparison: cost is bounded by
    band-bucket occupancy — q162's audit shape applies verbatim."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banded join guarantees recall only for max_hamming <= "
            f"bands - 1 ({bands - 1}); got {max_hamming}"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    banded = hashes.select(
        "media_id",
        "kind",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned(F.col("ahash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_value"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bd"),
    ).select(
        "media_id", "kind", "ahash", F.col("bd.band_idx"), F.col("bd.band_value")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            # kind equality: an image and a video with close bit
            # patterns are NOT duplicates of each other
            (F.col("a.kind") == F.col("b.kind"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
