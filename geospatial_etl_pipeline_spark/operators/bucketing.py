"""Bucketed-table co-located joins — the shuffle-free path for joins
that repeat on the same key.

At 100 TB the dominant cost of `orders ⋈ lineitem`-shaped joins is the
shuffle of both fact tables. Writing both sides bucketed (and sorted)
on the join key pins rows to hash buckets AT WRITE TIME; every later
join on that key is planned as a zero-exchange sort-merge join — the
shuffle is paid once per dataset lifetime, not once per query. This is
the relational twin of SURVEY §4.4's spatial bucketing note.

Rules encoded here:
- both sides must agree on (bucket column, bucket count) — Spark only
  elides the exchange when the output partitionings match;
- bucket counts should be a multiple of cluster parallelism;
- `sortBy` at write time also elides the per-task sort of the SMJ.

Reference parity: the reference re-fetches its region layer per input
file (REF:265, the O(files × regions) defect noted in SURVEY §2k.4);
bucketing is the general fix for "re-partitioning the same data every
query".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted table in the session catalog.

    ``path`` makes it an external table (test-friendly); bucket metadata
    lives in the catalog either way, which is what join planning reads."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    With matching bucket specs this plans as a sort-merge join with NO
    Exchange on either side (assert via ``"Exchange" not in
    df.explain()`` — tests/test_bucketing.py does exactly that)."""
    return spark.table(left_table).join(spark.table(right_table), on)
