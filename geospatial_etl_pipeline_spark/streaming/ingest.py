"""Streaming document ingestion with incremental dedup (SURVEY LLM-ops,
streaming twin of the batch q77 incremental dedup).

The 100 TB training-data ingestion shape: documents arrive continuously;
each micro-batch is fingerprinted in-row, deduplicated against ITSELF
(first occurrence wins inside the stream) and against the existing
corpus fingerprint set (stream-static join), and survivors land in a
partitioned parquet area via the exactly-once batch_id-keyed sink.

Scale notes:
- the fingerprint is the same md5-of-normalized-tokens as the batch
  dedup family (functions.text.fingerprint_t), so batch and streaming
  ingest agree on WHAT is a duplicate — tested equivalence with q77's
  anti-join.
- the corpus side projects to (fp) ONLY before the join: the stream
  never shuffles against document text. With the corpus side bucketed
  by fp (operators/bucketing.py) the probe is read-site local; AQE's
  runtime bloom filter is the unbucketed fallback.
- in-stream dedup uses dropDuplicates on the fingerprint: state is one
  16-byte key per distinct doc. Bounded for availableNow replays; for
  a 24/7 stream swap to dropDuplicatesWithinWatermark on an ingest-time
  column so state expires (documented production dial, same plan).
- stream-static LEFT OUTER + IS NULL filter implements the anti join
  (stream-static left_anti is not in Structured Streaming's supported
  matrix; the outer-join-filter form is, and plans identically:
  broadcast probe of the static side when small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint_t, tokens


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (schema from one
    footer read, same as stream_events)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def fingerprinted(docs: DataFrame) -> DataFrame:
    """Documents + content fingerprint, staged tokenization (the regex
    split runs once per row — plans/text.py module note)."""
    staged = docs.select("*", tokens("text").alias("_tok"))
    return staged.select(
        *[c for c in docs.columns], fingerprint_t(F.col("_tok")).alias("fp")
    )


def corpus_fingerprints(corpus: DataFrame) -> DataFrame:
    """The dedup probe side: DISTINCT fingerprints only — at 100 TB
    this is the only relation the stream ever joins."""
    return fingerprinted(corpus).select("fp").distinct()


def incremental_dedup_stream(
    doc_stream: DataFrame, corpus_fps: DataFrame
) -> DataFrame:
    """Survivors of (in-stream first-occurrence dedup) ∘ (corpus
    anti-join): the documents that should be APPENDED to the corpus."""
    stream_fp = fingerprinted(doc_stream).dropDuplicates(["fp"])
    marked = corpus_fps.withColumn("_seen", F.lit(1))
    return (
        stream_fp.join(F.broadcast(marked), "fp", "left_outer")
        .filter(F.col("_seen").isNull())
        .drop("_seen")
    )
