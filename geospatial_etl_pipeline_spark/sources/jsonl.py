"""JSONL (newline-delimited JSON) corpus source/sink — the de-facto
interchange format of LLM training pipelines (each line one document).

Read path: explicit schema ALWAYS (schema inference is a full extra
pass over 100 TB and infers drifting types between shards); malformed
lines are captured, not dropped — PERMISSIVE mode routes them to a
``_corrupt_record`` column so a data-quality gate can count them
(silent drop is how a bad shard loses a billion tokens unnoticed).

Write path: sharded .json.gz with bounded records per file — the
small-files discipline of operators/sinks.write_partitioned_parquet
applied to the text interchange format. Round-trip property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema-first JSONL read. With ``keep_corrupt`` the returned frame
    carries a ``_corrupt_record`` column holding the raw text of any
    unparseable line (NULL for good rows)."""
    full = schema
    if keep_corrupt and CORRUPT_COL not in schema.names:
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def corrupt_line_report(df: DataFrame) -> DataFrame:
    """One-row data-quality gate: total lines, corrupt lines, rate.

    Must reference at least one DATA column beside the corrupt column:
    Spark rejects scans whose only referenced file column is the
    internal corrupt record (QUERY_ONLY_CORRUPT_RECORD_COLUMN) because
    the parser would have nothing to fail ON. Counting the first schema
    column keeps the scan legal without caching — the cache-the-frame
    workaround Spark's error suggests is a non-starter at 100 TB."""
    c = F.col(CORRUPT_COL)
    # n_parsed must be corrupt-IS-NULL, NOT count(first column): a valid
    # line whose leading field is json-null parses fine but count()
    # skips it, breaking n_parsed + n_corrupt == n_lines. The first-col
    # count still appears (honestly named) because the scan must
    # reference at least one data column to stay legal.
    first_data_col = next(n for n in df.columns if n != CORRUPT_COL)
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(c.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_parsed"),
        F.sum(F.when(c.isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        (
            F.sum(F.when(c.isNotNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("corrupt_rate"),
        F.count(F.col(first_data_col))
        .cast("bigint")
        .alias("n_first_field_nonnull"),
    )


def write_jsonl(
    df: DataFrame,
    out_dir: str,
    shard_rows: int = 100_000,
    compress: bool = True,
) -> None:
    """Sharded JSONL writer with bounded rows per file. gzip by default
    (the format's conventional wire state); overwrite semantics match
    every other sink (REF:98's overwriteOutput contract)."""
    w = (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_rows)
    )
    if compress:
        w = w.option("compression", "gzip")
    w.json(out_dir)
