"""Parquet table loaders for the driver testdata star schema.

At scale these reads are plain ``spark.read.parquet`` scans: columnar,
predicate-pushdown and column-pruning friendly. Nothing is cached here —
callers decide lifetime; Catalyst prunes columns per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a plain (UTC-instant) TIMESTAMP whatever
    encoding the parquet files use. Seen in the wild across testdata
    regenerations:

    - TIMESTAMP(NANOS): Spark's reader rejects it; with
      ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as ``bigint``
      nanos, which we integer-truncate to micros (integer division only:
      raw nanos exceed 2**53 and would lose precision through a double) —
      matching DuckDB's reader, so oracle comparisons see the same
      instants.
    - timestamp[us] without the UTC flag → Spark ``TIMESTAMP_NTZ``:
      functions like ``unix_micros`` reject NTZ, so cast to TIMESTAMP.
      Value-identical under the UTC-pinned session (session.py sets
      ``spark.sql.session.timeZone=UTC``).
    - plain TIMESTAMP: the cast is a no-op.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dtype is not None and dtype != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
