"""Multimodal-column queries (SURVEY §2j [EXT], driver north star).

Media rides as opaque binary blobs + typed metadata (operators.
multimodal). The decode kernel is a clearly-marked deterministic fake
(codec libraries absent in this image) — but the plumbing these queries
exercise is the production shape: explicit schemas, Arrow-batched
``mapInPandas``, content-addressed hashing.

q95 is fully oracle-checked: blob synthesis, byte length and MD5
content hash are all engine-exact. q96 aggregates fake-decoded feature
vectors (an iterated-MD5 chain, not SQL-expressible) — rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    ahash64,
    decode_features,
    frame_sample,
    phash_near_dup_pairs,
    synthesize_media,
    synthesize_videos,
)
from ._util import t
from .catalog import register


@register(
    "q95_media_content_stats",
    tags=("multimodal", "llm-data"),
    oracle="""
SELECT doc_id AS media_id,
       'image' AS kind,
       CAST(octet_length(encode(repeat(text, 3))) AS BIGINT) AS n_bytes,
       md5(repeat(text, 3)) AS content_hash
FROM documents
""",
)
def q95_media_content_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column content statistics, all JVM-side: synthesize
    blob+metadata rows, then length/MD5 directly on the binary column —
    content addressing needs no Python, so it shouldn't pay the Arrow
    round-trip (that path is exercised by q96's decode). Oracle-checked
    end to end: blob synthesis, byte length and hash are engine-exact."""
    media = synthesize_media(t(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "kind",
        F.length("blob").cast("bigint").alias("n_bytes"),
        F.md5("blob").alias("content_hash"),
    )


@register(
    "q96_media_feature_moments",
    tags=("multimodal", "llm-data", "agg"),
    oracle="""
WITH feats AS (
  SELECT doc_id, 'image' AS kind, CAST(d.j AS INT) AS dim,
         ('0x' || substr(md5(repeat(text, 3)), 2 * d.j + 1, 2))::BIGINT
           / 256.0 AS x
  FROM documents, range(0, 8) d(j)
  WHERE text IS NOT NULL
)
SELECT kind, dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(x) AS min_x,
       MAX(x) AS max_x
FROM feats
GROUP BY kind, dim
""",
)
def q96_media_feature_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature moments over fake-decoded media vectors:
    decode via mapInPandas, posexplode the feature array, hash-agg per
    (kind, dim). The aggregate-after-UDF shape is the canonical
    feature-extraction pipeline at scale: the Python stage streams Arrow
    batches, the shuffle carries only |kinds|×dims partial aggregates.

    Oracle-checked (was rows-only in r1): for dims ≤ 16 the fake kernel
    is exactly the first ``dims`` md5 digest bytes / 256 — byte j of
    the digest == hex pair [2j, 2j+2), an exact dyadic double, so the
    SQL re-derivation hashes identically and the gate verifies the
    PYTHON kernel's arithmetic end to end (the >16-dim chained case
    stays unit-tested).

    NULL-text docs are excluded on BOTH sides (explicit WHERE / blob
    prefilter): a NULL blob has no bytes to decode — unfiltered, the
    Python kernel would crash on None while DuckDB's md5(NULL) rows
    still COUNT(*) into n (hostile-input sweep finding)."""
    media = synthesize_media(t(spark, sf_dir, "documents")).filter(
        F.col("blob").isNotNull()
    )
    feats = decode_features(media, dims=8, allow_fake=True)
    ex = feats.select("kind", F.posexplode("features").alias("dim", "x"))
    return ex.groupBy("kind", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )


@register(
    "q97_video_frame_inventory",
    tags=("multimodal", "llm-data", "video", "agg"),
    oracle="""
WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 50),
frames AS (
  SELECT doc_id AS media_id,
         CAST((ts // 100) AS INT) AS frame_idx,
         CAST(ts AS INT) AS ts_ms
  FROM docs, unnest(range(0, 1200, 250)) t(ts)
)
SELECT media_id,
       COUNT(*) AS n_frames,
       CAST(MIN(ts_ms) AS INT) AS first_ts,
       CAST(MAX(ts_ms) AS INT) AS last_ts,
       CAST(SUM(frame_idx) AS BIGINT) AS sum_idx
FROM frames GROUP BY media_id
""",
)
def q97_video_frame_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling under the oracle gate: synthesize fake
    videos (12 frames @ 100 ms), sample every 250 ms via
    operators.multimodal.frame_sample (the real per-row frame fan-out +
    timestamp/index arithmetic; only the byte<->frame codec is fake),
    then aggregate the frame inventory per video. The oracle re-derives
    the sampling arithmetic relationally — wrong fan-out, timestamps, or
    frame indexing breaks the hash. Frame PIXEL content is covered by
    unit tests (not SQL-expressible)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    vids = synthesize_videos(docs, n_frames=12, frame_ms=100)
    frames = frame_sample(vids, 250, allow_fake=True)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("ts_ms").alias("first_ts"),
        F.max("ts_ms").alias("last_ts"),
        F.sum("frame_idx").cast("bigint").alias("sum_idx"),
    )


@register(
    "q256_media_ahash_near_dup",
    tags=("multimodal", "llm-data", "dedup", "phash"),
    oracle=None,  # the aHash pixel math (byte tiling → 8×8 NN downscale
    # → mean threshold → bitpack) is not SQL-expressible; the IDENTICAL
    # banded-Hamming dataflow is value-hash checked by the SimHash twin
    # q257 (the q54/q84 twin discipline), and the aHash kernel itself is
    # pixel-pinned in tests/test_operators.py + codec-invariant in
    # tests/test_codecs.py.
    oracle_twin="q257_simhash_hamming_pairs",
)
def q256_media_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup — MinHash-for-pixels: 64-bit average-hash
    per media blob (operators.multimodal.ahash64; decode → 8×8
    nearest-neighbor downscale → threshold at the mean → bitpack), then
    banded Hamming join (4×16-bit bands; pigeonhole guarantees every
    pair within Hamming ≤ 3 shares a band) and exact
    bit_count(xor) verification. Returns (id_a, id_b, hamming) — what
    an image-dedup pass ships where content_hash only catches
    byte-identical copies.

    Degenerate blobs are pre-filtered (NULL text → NULL blob has no
    bytes to hash; empty text → zero-length pixel source cannot tile) —
    same guard, both hostile-fixture classes.

    Scale shape: hashing is Arrow-batched mapInPandas (blobs never
    leave the executor), candidates come from the (band_idx,
    band_value) equi-join — shuffle bounded by band-bucket occupancy,
    never all-pairs; q162's skew-audit shape applies to these buckets
    verbatim."""
    media = synthesize_media(t(spark, sf_dir, "documents")).filter(
        F.col("blob").isNotNull() & (F.length("blob") > 0)
    )
    hashes = ahash64(media, allow_fake=True)
    return phash_near_dup_pairs(hashes, max_hamming=3, bands=4)


# q257's oracle nests q44's REGISTERED SimHash oracle verbatim (the
# q188 nesting / q175 slicing discipline): the signature this pair
# query bands is exactly the one q44 serves, and both sit under the
# value-hash gate.
from . import extra as _extra  # noqa: E402,F401 — forces q44 registration
from .catalog import QUERIES as _QUERIES  # noqa: E402

_SQL_SIMHASH = _QUERIES["q44_simhash"].oracle


@register(
    "q257_simhash_hamming_pairs",
    tags=("multimodal", "dedup", "llm-data", "simhash", "phash"),
    oracle=f"""
WITH sig AS ({_SQL_SIMHASH}),
banded AS (
  SELECT doc_id, simhash32 AS h,
         b.b AS band_idx,
         (simhash32 // CAST(pow(2, 8 * b.b) AS BIGINT)) % 256 AS band_value
  FROM sig, range(0, 4) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h AS ha, b.h AS hb
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx
   AND a.band_value = b.band_value AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 1
""",
)
def q257_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS — the retrieval tail q44's
    signatures were built for, and q256's hash-checked twin in one: the
    SAME registered banded-Hamming operator (phash_near_dup_pairs —
    banding, pigeonhole candidate join, dedup, bit_count(xor) verify,
    threshold) driven by q44's 32-bit SimHash (``sig_bits=32`` → 4×8-bit
    bands), so the ENTIRE pair dataflow sits under the value-hash gate
    while only q256's pixel-hash kernel stays rows-only (exactly the
    q54→q84 LSH discipline — and unlike an md5-signature strawman this
    twin is NON-vacuous: near-dup docs produce real Hamming-≤1 pairs).
    The oracle nests q44's registered oracle verbatim, so the banded
    signature cannot drift from the one q44 reports."""
    sig = (
        _QUERIES["q44_simhash"].fn(spark, sf_dir)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("text").alias("kind"),
            F.col("simhash32").alias("ahash"),
        )
    )
    return phash_near_dup_pairs(sig, max_hamming=1, bands=4, sig_bits=32)
