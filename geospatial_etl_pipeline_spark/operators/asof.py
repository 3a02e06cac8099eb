"""As-of (time-travel) join — an operator Spark lacks natively.

Semantics: for every left row, attach the payload of the most recent
right row with the same key and ``right.ts <= left.ts`` (inclusive).

Implementation is the union+window trick, NOT a range join:

1. Tag both sides, union them on (keys, ts, side, payload).
2. One window partitioned by key, ordered by (ts, side) — right rows
   sort before left rows at equal timestamps, making the join inclusive.
3. ``last(payload, ignorenulls=True)`` over the running frame gives each
   left row the latest right payload seen so far.

Cost: ONE shuffle of |L|+|R| rows on the key — O(n log n) per key,
versus the O(|L|·|R|) blowup of the naive range join per key. At 100 TB
this is the difference between a working operator and a dead one. Skewed
keys are split by AQE since the shuffle is a plain hash partitioning.

Reference parity note: the reference has no as-of join (it is a fixed
ETL script); this is an [EXT] operator mandated by the driver's `events`
table (SURVEY.md §2c "range / as-of / interval joins").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_payload: list[str],
    prefix: str = "asof_",
    include_right_count: bool = False,
    count_col: str = "n_right_before",
) -> DataFrame:
    """Attach the latest right payload at-or-before each left row's ts.

    Parameters
    ----------
    on: equi-join key columns (present in both sides).
    ts: event-time column name (present in both sides).
    right_payload: right columns to carry; they appear as
        ``{prefix}{col}`` on the output (NULL when no right row precedes).
    include_right_count: also emit how many right rows precede (inclusive).
    """
    l_cols = left.columns
    lhs = left.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*l_cols).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    rhs = right.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*l_cols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_payload).alias("_r"),
    )
    u = lhs.unionByName(rhs)
    # Tie policy (documented, deterministic): when several RIGHT rows
    # share the same (key, ts), the survivor is the one with the
    # GREATEST payload struct (field-order lexicographic comparison over
    # right_payload) — `_r` joins the orderBy so `last(_r)` is total-
    # ordered and reproducible across runs/partitionings, not a
    # partition-order accident (ADVICE r1). Left rows sort after right
    # rows at equal ts via `_side`, so at-or-before semantics hold.
    # Requires orderable payload types (no maps) — true of columnar
    # payloads in practice.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    if include_right_count:
        u = u.withColumn(
            "_n_r", F.sum(1 - F.col("_side")).over(w).cast("bigint")
        )
    out = u.filter(F.col("_side") == 1)
    cols = [F.col("_l")[c].alias(c) for c in l_cols]
    cols += [F.col("_last_r")[c].alias(f"{prefix}{c}") for c in right_payload]
    if include_right_count:
        cols.append(F.col("_n_r").alias(count_col))
    return out.select(*cols)
