"""Multimodal column plumbing (SURVEY §2j [EXT], driver north star).

Media rides as opaque ``binary`` columns with a typed metadata struct —
the only schema that scales to 100 TB of images/audio/video in a
relational engine (content-addressed blobs, columnar metadata, operators
as Arrow-batched transforms).

The byte<->pixel codec boundary is PLUGGABLE (see ``resolve_codec``):
``PillowCodec`` is wired in and used automatically when PIL is
importable; the clearly-marked deterministic ``FakeCodec`` is the
fallback (``allow_fake=True`` required to opt into it explicitly).
Everything downstream of decode — feature extraction, the
nearest-neighbor ``resize`` math, ``frame_sample`` timestamp
arithmetic, aHash bit-packing, and all Spark plumbing (schema, Arrow
batch iteration, per-frame fan-out, partition sizing) — is real,
codec-independent, and tested end to end; tests parametrize over every
available codec so the same pixel assertions run under both.
Video demux still needs ffmpeg (not importable here) and stays behind
the fake container with the same pluggable seam.
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
        # nullable: media_id inherits doc_id, and a NULL id is DATA (the
        # dup/NULL-id hostile fixture) — a False here turns it into an
        # Arrow crash ("Value at index is null") instead of a row
        StructField("media_id", LongType(), True),
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
        StructField("media_id", LongType(), True),  # see MEDIA_SCHEMA
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


def _pixel_features(px: "np.ndarray", dims: int) -> "np.ndarray":
    """REAL feature kernel over decoded grayscale pixels: global moments
    (mean, std, min, max) followed by a normalized histogram, truncated/
    padded to ``dims``. Codec-independent math — runs identically on
    Pillow-decoded PNGs and fake-container pixels."""
    flat = px.astype(np.float64).ravel() / 255.0
    if flat.size == 0:
        # A degenerate 0×N image (Pillow will happily decode one)
        # must not kill the whole mapInPandas task: min()/max() raise
        # on empty and mean() emits NaN. All-zero features = nodata.
        return np.zeros(dims, dtype=np.float64)
    moments = [flat.mean(), flat.std(), flat.min(), flat.max()]
    nbins = max(dims - len(moments), 0)
    if nbins:
        hist, _ = np.histogram(flat, bins=nbins, range=(0.0, 1.0))
        moments.extend(hist / max(flat.size, 1))
    return np.asarray(moments[:dims], dtype=np.float64)


def decode_features(
    media: DataFrame, dims: int = 8, allow_fake: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Decode + feature-extract each blob into a fixed-length vector.

    Codec seam (:func:`resolve_codec`): under the FAKE codec the
    feature kernel is the MD5-chained byte expansion (`_fake_decode`) —
    deterministic and SQL-modelable, which is what q95/q96's oracles
    pin. Under a REAL codec (Pillow, picked automatically when
    importable) blobs decode to pixels and features are
    :func:`_pixel_features` moments+histogram — real math, no SQL
    oracle (DuckDB cannot decode PNGs; the pixel tests cover it).

    Under a real codec only IMAGE rows are featurized (same guard as
    ahash64 — handing an audio/video blob to an image decoder raises
    mid-job); the fake kernel hashes raw bytes, so it featurizes
    every kind.
    """
    impl = resolve_codec(codec, allow_fake)
    if impl is not FakeCodec:
        media = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if impl is FakeCodec:
                feats = [_fake_decode(b, dims) for b in pdf["blob"]]
            else:
                feats = [
                    _pixel_features(
                        impl.decode_image(bytes(b), m.get("width"),
                                          m.get("height")),
                        dims,
                    )
                    for b, m in zip(pdf["blob"], pdf["meta"])
                ]
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
# Pluggable pixel codec. The byte<->pixel step is the ONLY part that
# differs between the deterministic fake containers and a real library;
# everything downstream of decode — nearest-neighbor resize indexing,
# frame timestamp arithmetic, aHash bit-packing, the Spark plumbing —
# is the real production math and runs unchanged under either codec.
# resolve_codec picks Pillow automatically when PIL is importable.
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


class FakeCodec:
    """Deterministic codec over the FIMG/FVID containers (and raw-byte
    tiling for fixture blobs). No external libraries; every pixel is a
    pure function of the input bytes, so tests are bit-reproducible."""

    name = "fake"
    image_mime = "image/x-fake"

    @staticmethod
    def available() -> bool:
        return True

    @staticmethod
    def decode_image(blob: bytes, meta_w: int | None = None,
                     meta_h: int | None = None) -> np.ndarray:
        return fake_decode_image(blob, meta_w, meta_h)

    @staticmethod
    def encode_image(arr: np.ndarray) -> bytes:
        return fake_encode_image(arr)

    @staticmethod
    def decode_video(blob: bytes) -> tuple[np.ndarray, int]:
        return fake_decode_video(blob)

    @staticmethod
    def encode_video(frames: np.ndarray, frame_ms: int) -> bytes:
        return fake_encode_video(frames, frame_ms)


class PillowCodec:
    """Real image codec backed by Pillow, used automatically when PIL
    is importable (it is an optional dependency — this module never
    hard-imports it). Grayscale ('L') pixels in/out; encode writes
    lossless PNG so decode(encode(arr)) is exact and the same pixel
    tests that pin the fake codec pass unchanged. Video stays
    unsupported (that seam needs ffmpeg, not Pillow)."""

    name = "pillow"
    image_mime = "image/png"

    @staticmethod
    def available() -> bool:
        try:
            import PIL.Image  # noqa: F401
        except ImportError:
            return False
        return True

    @staticmethod
    def decode_image(blob: bytes, meta_w: int | None = None,
                     meta_h: int | None = None) -> np.ndarray:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(blob)) as img:
            return np.asarray(img.convert("L"), dtype=np.uint8)

    @staticmethod
    def encode_image(arr: np.ndarray) -> bytes:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.ascontiguousarray(arr, dtype=np.uint8), mode="L"
        ).save(buf, format="PNG")
        return buf.getvalue()

    @staticmethod
    def decode_video(blob: bytes) -> tuple[np.ndarray, int]:
        raise NotImplementedError(
            "PillowCodec has no video demuxer; video needs ffmpeg"
        )

    @staticmethod
    def encode_video(frames: np.ndarray, frame_ms: int) -> bytes:
        raise NotImplementedError(
            "PillowCodec has no video muxer; video needs ffmpeg"
        )


CODECS = {FakeCodec.name: FakeCodec, PillowCodec.name: PillowCodec}


def available_codecs() -> list[str]:
    """Names of codecs usable in this environment (fake is always
    available; pillow appears when PIL is importable)."""
    return [name for name, c in CODECS.items() if c.available()]


def resolve_codec(codec: str | None = None, allow_fake: bool = False):
    """Pick the codec for a media operator.

    - ``codec='pillow'`` / ``codec='fake'``: that codec explicitly, or
      NotImplementedError if its library is absent.
    - ``codec=None, allow_fake=True``: the FAKE codec, always —
      allow_fake is a determinism pin, not a fallback: the q95/q96
      oracles model the fake kernel byte-for-byte, so installing
      Pillow must not silently change their results. Ask for Pillow
      by name (or pass allow_fake=False) to get it.
    - ``codec=None, allow_fake=False``: a REAL codec if one is
      importable (Pillow), else NotImplementedError — the fake never
      runs silently by default."""
    if codec is not None:
        impl = CODECS.get(codec)
        if impl is None:
            raise ValueError(f"unknown codec {codec!r}; known: {sorted(CODECS)}")
        if not impl.available():
            raise NotImplementedError(
                f"codec {codec!r} is not available in this environment "
                f"(library not importable)"
            )
        return impl
    if allow_fake:
        return FakeCodec
    if PillowCodec.available():
        return PillowCodec
    raise NotImplementedError(
        "no real media codec (Pillow/ffmpeg) is importable in this "
        "environment; pass allow_fake=True (or codec='fake') to run the "
        "deterministic fake codec through the real math and Spark plumbing"
    )


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
    media: DataFrame, width: int, height: int, allow_fake: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Image resize: media(MEDIA_SCHEMA) -> media(MEDIA_SCHEMA) with
    meta.width/height rewritten and the blob re-encoded at the target
    size. Nearest-neighbor sampling (real math, codec-independent);
    decode/encode go through the pluggable codec seam
    (:func:`resolve_codec`): Pillow automatically when importable, or
    the deterministic fake codec with ``allow_fake=True`` /
    ``codec='fake'`` — same plan either way. Arrow-batched
    ``mapInPandas``: one task per partition of blobs, no driver work."""
    impl = resolve_codec(codec, allow_fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                meta = row["meta"]
                arr = impl.decode_image(
                    bytes(row["blob"]), meta.get("width"), meta.get("height")
                )
                resized = _nn_resize(arr, width, height)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "blob": impl.encode_image(resized),
                        "meta": {
                            "mime": impl.image_mime,
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
    media: DataFrame, every_ms: int, allow_fake: bool = False,
    frame_codec: str | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_ms, blob=encoded frame image), sampling at
    t = 0, every_ms, 2*every_ms, … < duration; frame_idx = t // the
    stream's frame interval. The timestamp arithmetic is the real
    operator; only the byte<->frame codec is fake (no ffmpeg here) —
    swap it for a real demuxer with no change to the Spark shape (the
    per-row fan-out to N frame rows is the part that matters at scale:
    it happens inside the executor batch, never on the driver).

    TWO codec seams, deliberately separate (review finding — one
    parameter conflated them and made the documented Pillow path
    unreachable): the DEMUX seam is ffmpeg-shaped and only the fake
    FVID container implements it today, so ``allow_fake=True`` is
    required outright; the per-frame IMAGE-ENCODE seam is
    ``frame_codec`` (resolve_codec semantics: 'pillow' by name emits
    real PNG frame rows when PIL is importable; default stays the
    deterministic fake so q97's oracle is stable)."""
    if not allow_fake:
        raise NotImplementedError(
            "video demuxing needs ffmpeg, which is not available in this "
            "environment; the deterministic fake FVID container is the "
            "only demuxer — pass allow_fake=True to run it through the "
            "real sampling math and Spark plumbing"
        )
    img = resolve_codec(frame_codec, allow_fake=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                frames, frame_ms = FakeCodec.decode_video(bytes(row["blob"]))
                duration = len(frames) * frame_ms
                ts = 0
                while ts < duration:
                    idx = ts // frame_ms
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": int(idx),
                            "ts_ms": int(ts),
                            "blob": img.encode_image(frames[idx]),
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
        StructField("media_id", LongType(), True),  # see MEDIA_SCHEMA
        StructField("kind", StringType(), False),
        StructField("ahash", LongType(), False),
    ]
)


def ahash64(
    media: DataFrame, allow_fake: bool = False, codec: str | None = None
) -> DataFrame:
    """64-bit average-hash (aHash) per media blob: decode → 8×8
    nearest-neighbor downscale (REAL math) → threshold at the mean →
    bit-packed signature. The perceptual fingerprint that survives
    re-encoding/resizing, where content_hash (exact bytes) does not —
    the image-dedup analogue of MinHash for text.

    The byte→pixel step is the pluggable codec seam
    (:func:`resolve_codec` — Pillow automatically when importable, fake
    with ``allow_fake=True``); everything after it is production math.
    Arrow-batched mapInPandas; blobs never leave the executor.

    IMAGE rows only: non-image kinds are filtered out up front (a
    video container tiled through the image decoder would hash to
    silent garbage, and audio rows have no pixel dims to shape — the
    frame-sampling path is the video analogue)."""
    impl = resolve_codec(codec, allow_fake)

    media = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, blob, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["blob"], pdf["meta"]
            ):
                px = impl.decode_image(
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
                # NULL media_id is data (nullable schema) — int(NaN)
                # would throw inside the Arrow batch
                out.append(
                    (None if pd.isna(mid) else int(mid), kind, h)
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "ahash"])

    return media.mapInPandas(run, AHASH_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, bands: int = 4,
    sig_bits: int = 64,
) -> DataFrame:
    """Near-duplicate media pairs by banded Hamming join: the
    ``sig_bits``-bit signature splits into ``bands`` exact-match bands;
    by pigeonhole any pair within Hamming distance ``bands − 1`` shares
    at least one band, so a (band_idx, band_value) equi-join generates
    ALL such candidates (guaranteed recall for max_hamming ≤ bands − 1,
    the same guarantee structure as MinHash banding) and
    ``bit_count(xor)`` verifies exactly. Never an all-pairs comparison:
    cost is bounded by band-bucket occupancy — q162's audit shape
    applies verbatim. ``sig_bits`` serves non-64-bit fingerprints (the
    32-bit q44 SimHash rides the same dataflow in q257); input hashes
    MUST fit in ``sig_bits`` bits — wider hashes leave their high bits
    out of every band, silently voiding the pigeonhole recall
    guarantee."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banded join guarantees recall only for max_hamming <= "
            f"bands - 1 ({bands - 1}); got {max_hamming}"
        )
    if sig_bits % bands != 0:
        # a remainder would band only width*bands low bits and leave the
        # top sig_bits % bands bits out of every band — pairs differing
        # only there would LOOK like candidates everywhere yet the
        # recall proof no longer covers them (r7 advice finding)
        raise ValueError(
            f"sig_bits ({sig_bits}) must be divisible by bands ({bands}):"
            " every bit must belong to exactly one band for the"
            " pigeonhole recall guarantee"
        )
    width = sig_bits // bands
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
