"""Event-stream queries over ``events`` (SURVEY §2j [EXT]).

Batch forms of the streaming surface: tumbling windows, as-of join,
sessionization, JSON prop extraction. The same plans run under
Structured Streaming (see ``streaming/``); these batch twins are the
oracle-checkable versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.asof import asof_join
from ._util import (
    DEC,
    at_rank,
    dsum,
    int_hist,
    med2,
    qsum,
    qsum_big,
    sql_at_rank,
    sql_dsum,
    sql_int_hist,
    sql_med2,
    sql_qsum,
    t,
)
from .catalog import QUERIES, register


# ---- event-time boundary (round 8) ----------------------------------------
#
# Event-time operators (tumbling/sliding windows, sessions, as-of,
# lag/lead sequences, SCD2 versioning, daily/weekly buckets, EWMA) are
# undefined for rows with no timestamp, and the engines disagree about
# them exactly where clean data can't show it: Spark's F.window()
# silently DROPS a NULL ts while DuckDB's date_trunc/time_bucket groups
# it as a NULL bucket, and window ORDER BY ts puts NULLs first in Spark
# but last in DuckDB — 15 event-time queries diverged on the r8 NULL-ts
# identity probe (events_dupid fixture) until this boundary was pinned.
# The contract mirrors _util.temb's for vectors: each of those queries
# reads THIS relation (ts IS NOT NULL) and the _SQL-twin appears in its
# oracle, so both engines see the same rows. A streaming deployment
# enforces the same boundary mechanically — a NULL event time can never
# pass a watermark. Queries keyed on arrival order rather than event
# time (q190) instead PIN the NULL ordering on both sides.


def te(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table behind the event-time boundary (ts non-NULL).
    SQL twin inlined in oracles as
    ``(SELECT * FROM events WHERE ts IS NOT NULL)``."""
    return t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())



@register(
    "q60_tumbling_window_counts",
    tags=("events", "window", "streaming-twin"),
    oracle=f"""
SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
GROUP BY 1, 2
""",
)
def q60_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregate — the batch twin of the
    streaming windowed count (streaming/events.py)."""
    e = te(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "5 minutes").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


@register(
    "q65_sliding_window_counts",
    tags=("events", "window", "streaming-twin"),
    oracle=f"""
SELECT CAST(time_bucket(INTERVAL '5 minutes', ts)
            - k.k * INTERVAL '5 minutes' AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM (SELECT * FROM events WHERE ts IS NOT NULL) events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
GROUP BY 1, 2
""",
)
def q65_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes — each event belongs to
    exactly window/slide = 2 overlapping windows. Spark's F.window
    expands the event into its window memberships before the aggregate
    (one shuffle, partial-agg'd); the oracle states the same expansion
    relationally as a cross join against the offset set {0, 1}. Batch
    twin of streaming windowed_counts(slide=...)."""
    e = te(spark, sf_dir)
    return e.groupBy(
        F.window("ts", "10 minutes", "5 minutes").start.alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@register(
    "q61_asof_last_click",
    tags=("events", "asof", "join"),
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       MAX(c.ts) AS asof_click_ts,
       COUNT(c.event_id) AS n_clicks_before
FROM (SELECT * FROM events WHERE ts IS NOT NULL) p
LEFT JOIN (SELECT * FROM events WHERE ts IS NOT NULL) c
  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
""",
)
def q61_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest click at-or-before it.

    The oracle is the quadratic relational spec (join + MAX); the engine
    runs operators.asof.asof_join — union + single window, O(n log n),
    one shuffle on user_id."""
    e = te(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("ts").alias("click_ts")
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        right_payload=["click_ts"],
        include_right_count=True,
        count_col="n_clicks_before",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_ts"),
        "n_clicks_before",
    )


@register(
    "q62_sessionize",
    tags=("events", "window", "session"),
    oracle="""
WITH x AS (
  SELECT user_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM x
GROUP BY user_id
""",
)
def q62_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap via lag + flag-sum.
    Integer microsecond arithmetic — engine-exact. One shuffle on
    user_id shared by the window and the aggregate."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = e.select(
        "user_id",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q46_range_join_clicks_before_purchase",
    tags=("events", "join", "range-join"),
    oracle="""
SELECT p.event_id, p.user_id,
       COUNT(c.event_id) AS n_clicks_30m
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL '30 minutes'
 AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
""",
)
def q46_range_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval/range join: clicks in the 30 minutes strictly before
    each purchase, per user.

    The equality on user_id makes this a hash/sort-merge equi join with
    the time range as a post-join predicate — at 100 TB the shuffle is
    keyed on user_id only, so the range adds no extra exchange. (A
    band-bucketing key would be needed only for a pure range join with
    no equality column.)"""
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    joined = p.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_event_id").alias("n_clicks_30m")
    )


@register(
    "q47_user_event_gaps",
    tags=("events", "window", "lag-lead"),
    oracle="""
SELECT event_id, user_id,
       LAG(event_id)  OVER w AS prev_event_id,
       LEAD(event_id) OVER w AS next_event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q47_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: neighbor event ids and the inter-event gap in
    integer microseconds (engine-exact). One shuffle on user_id serves
    both window functions."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@register(
    "q63_json_props",
    tags=("events", "json"),
    oracle="""
WITH k AS (
  -- NESTED CASE, deliberately: with the extraction inside the outer
  -- WHEN's conjunction, DuckDB's adaptive conjunct reordering can run
  -- json_extract_string before json_valid on a large table and crash
  -- on malformed props (reproduced at ~2M rows; small fixtures pass).
  -- A CASE branch is guaranteed-conditional; a conjunct is not.
  SELECT event_type,
         CASE WHEN json_valid(props) THEN
           CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                    '^-?[0-9]{1,9}$')
                THEN CAST(json_extract_string(props, '$.k') AS INT) END
         END AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM k
GROUP BY event_type
""",
)
def q63_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON string prop → typed column →
    aggregate. get_json_object is a codegen'd JVM path (no UDF).

    Hostile-props contract, pinned in BOTH engines: k is extracted only
    when props is valid JSON AND '$.k' is an integer LITERAL of ≤9
    digits; everything else is NULL. Each clause closes a real
    divergence/crash (hostile sweep + review): DuckDB's json_extract
    ERRORS on malformed JSON where get_json_object is tolerant
    (json_valid guard); a non-integer k crashes both ANSI casts, and
    the engines even disagree on '1.5' (DuckDB TRY_CAST rounds to 2,
    Spark truncates) — the digit regex makes the value well-defined;
    the 9-digit bound keeps CAST AS INT overflow-proof by
    construction. Real event streams always carry some broken props —
    an oracle that crashes on them can't gate."""
    e = t(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    k = F.when(k_str.rlike("^-?[0-9]{1,9}$"), k_str.cast("int"))
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q64_pandas_udaf_wavg",
    tags=("events", "udf", "pandas-udaf"),
    oracle="""
SELECT event_type,
       CAST(CAST(
         SUM(CASE WHEN isfinite(value) AND abs(value) < 9.0e6
                   AND user_id IS NOT NULL
             THEN CAST(FLOOR(value * 1000000000000.0) AS BIGINT)
                  * (1 + user_id % 10) END)
         // SUM(CASE WHEN isfinite(value) AND abs(value) < 9.0e6
                      AND user_id IS NOT NULL
                THEN 1 + user_id % 10 END)
       AS BIGINT) AS DOUBLE)
         / 1000000000000.0 AS wavg_value
FROM events
GROUP BY event_type
""",
)
def q64_pandas_udaf_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF surface (SURVEY §2j): weighted average of
    ``value`` (weight = 1 + user_id % 10) per event type, computed in a
    vectorized Arrow-batched UDAF.

    The UDAF floor-quantizes values to int64 INSIDE the kernel
    (functions/udfs.qwavg_pandas) so the numpy accumulation is exact and
    order-free — which is what makes a Python-side aggregate
    oracle-comparable bit-for-bit. Arrow transfers columns batch-wise;
    the aggregate is partial-agg'd per partition like any JVM agg."""
    from ..functions.udfs import qwavg_pandas

    e = t(spark, sf_dir, "events")
    weighted = e.select(
        "event_type",
        "value",
        (F.lit(1) + F.col("user_id") % 10).cast("long").alias("w"),
    )
    return weighted.groupBy("event_type").agg(
        qwavg_pandas("value", "w").alias("wavg_value")
    )


@register(
    "q86_funnel_steps",
    tags=("events", "funnel", "sequence", "join"),
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(0 AS BIGINT) AS sum_gap_us FROM v
UNION ALL
SELECT 'click', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(epoch_us(c.t2) - epoch_us(v.t1)) AS BIGINT)
FROM c JOIN v USING (user_id)
UNION ALL
SELECT 'purchase', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(epoch_us(p.t3) - epoch_us(c.t2)) AS BIGINT)
FROM p JOIN c USING (user_id)
""",
)
def q86_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per stage, how many
    users progressed STRICTLY AFTER their previous-stage first event,
    plus the summed stage-transition latency (exact integer micros —
    emit the sum, not the float mean, so the gate stays bit-exact).

    Shape: each stage is one filtered groupBy-min plus an equi-join on
    user_id against the previous stage — partial-aggregable, shuffles
    keyed on user_id and reused across stages; no window over the full
    event stream, no self-theta-join. The k-stage generalization is the
    same chain, k joins deep."""
    e = t(spark, sf_dir, "events")

    def first_after(etype: str, prev, prev_t: str, out_t: str):
        f = e.filter(F.col("event_type") == etype).select("user_id", "ts")
        return (
            f.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")

    s1 = v.agg(
        F.lit("view").alias("stage"),
        F.count(F.lit(1)).alias("n_users"),
        F.lit(0).cast("bigint").alias("sum_gap_us"),
    )
    s2 = (
        c.join(v, "user_id")
        .agg(
            F.lit("click").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.unix_micros("t2") - F.unix_micros("t1"))
            .cast("bigint")
            .alias("sum_gap_us"),
        )
    )
    s3 = (
        p.join(c, "user_id")
        .agg(
            F.lit("purchase").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.unix_micros("t3") - F.unix_micros("t2"))
            .cast("bigint")
            .alias("sum_gap_us"),
        )
    )
    return s1.unionByName(s2).unionByName(s3)


@register(
    "q87_cohort_retention",
    tags=("events", "cohort", "retention", "agg"),
    oracle="""
WITH first_day AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
)
SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_day,
       CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM activity a JOIN first_day f USING (user_id)
GROUP BY 1, 2
""",
)
def q87_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity day,
    counted active per (cohort, day-offset) — the engagement analysis
    every event warehouse runs. COUNT(*) over the DISTINCT
    (user, day) activity set = exact distinct-user counts without a
    second distinct aggregation.

    Shape: two hash aggs (first-day per user; distinct activity days)
    + one equi-join on user_id + one partial-aggregable rollup. All
    integer/date arithmetic — engine-exact."""
    e = t(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort")).cast("int").alias(
                "day_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q88_scd2_user_history",
    tags=("events", "scd2", "window", "cdc"),
    oracle="""
SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q88_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build — the warehouse versioning shape: treat
    each user's event stream as CDC updates and emit one VERSIONED row
    per change with [valid_from, valid_to) and an is_current flag
    (valid_to = next change's timestamp via lead(); open-ended for the
    latest). event_id joins the window ordering so timestamp ties
    version deterministically.

    Shape: ONE window keyed on user_id — a single shuffle regardless of
    history depth; the same plan incrementalizes per partition (merge
    new changes, re-window only affected keys)."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "q89_range_frame_rolling",
    tags=("events", "window", "range-frame"),
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_10m,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_last_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
""",
)
def q89_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling aggregates — the time-based window frame
    (everything within the last 10 minutes of EVENT TIME per user),
    distinct from q21's ROWS frame (last N rows): RANGE frames bound by
    the ordering VALUE, so ties and gaps behave correctly for event
    data. Ordering key = exact integer micros; the windowed sum uses
    the DECIMAL(38,6) exact-sum construction (order-free, engine-exact,
    same as _util.dsum). One window = one shuffle keyed on user_id."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_10m"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_last_10m"),
    )


@register(
    "q94_session_stats",
    tags=("events", "window", "session"),
    oracle="""
WITH x AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
),
flagged AS (
  SELECT user_id, event_id, value, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM x
),
numbered AS (
  SELECT user_id, value, us,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def q94_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates on top of q62's sessionization: session id
    via cumulative-sum of the 30-minute-gap flag, then events, duration
    (integer micros) and exact-decimal value sum per (user, session).

    Shape at scale: ONE shuffle total. The lag window, the cumsum
    window and the final groupBy all key on user_id —
    HashPartitioning(user_id) satisfies the ClusteredDistribution on
    (user_id, session_id), so Catalyst inserts no second exchange for
    the aggregate (asserted in tests/test_plan_shapes.py). The cumsum
    window orders by (us, event_id) — unique per user — so the default
    RANGE frame has no tie peers and both engines agree row-for-row."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = e.select(
        "user_id",
        "event_id",
        "value",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    cum_w = Window.partitionBy("user_id").orderBy("us", "event_id")
    numbered = flagged.select(
        "user_id",
        "value",
        "us",
        F.sum("new_session").over(cum_w).cast("bigint").alias("session_id"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


@register(
    "q100_hourly_gap_fill",
    tags=("events", "time-series", "resample", "gap-fill"),
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS hour_value
  FROM events GROUP BY user_id, hr
),
bounds AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS hr_min,
         date_trunc('hour', MAX(ts)) AS hr_max
  FROM events GROUP BY user_id
),
spine AS (
  SELECT b.user_id, unnest(generate_series(b.hr_min, b.hr_max,
                                           INTERVAL 1 HOUR)) AS hr
  FROM bounds b
)
SELECT s.user_id, s.hr AS hour_start,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       last_value(h.hour_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
FROM spine s LEFT JOIN hourly h
  ON h.user_id = s.user_id AND h.hr = s.hr
""",
)
def q100_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill + forward fill: a dense
    hourly spine per user (min..max event hour), hours with no events
    emitted as zero-count rows, and the last observed hourly value
    carried forward — the regularization step before any
    sequence-model/feature-store consumption of event data.

    Scale shape: the spine is generated IN-EXECUTOR
    (sequence + explode per user — never a driver loop or a giant
    range-table join); hourly pre-aggregation happens BEFORE the spine
    join, so the join's right side is one row per (user, active hour),
    not raw events. Exchanges: hourly agg, bounds agg, spine join,
    ffill window — all keyed on user_id or (user_id, hr); AQE coalesces
    the small ones. Per-user spine length is bounded by the retention
    window at 100 TB (span/hour rows, not event count). The hourly
    value is the exact-decimal sum, so the forward-filled double is
    engine-identical."""
    e = t(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy("user_id", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("hour_value"),
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("hr_min"),
        F.date_trunc("hour", F.max("ts")).alias("hr_max"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("hr_min", "hr_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    joined = spine.join(hourly, ["user_id", "hr"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("hr").alias("hour_start"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(w).alias("ffill_value"),
    )


@register(
    "q102_user_event_milestones",
    tags=("events", "window", "nth-value"),
    oracle="""
SELECT user_id, first_event_id, third_event_id, last_event_id, n_events
FROM (
  SELECT user_id,
         first_value(event_id) OVER w AS first_event_id,
         nth_value(event_id, 3) OVER w AS third_event_id,
         last_value(event_id) OVER w AS last_event_id,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_events,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
) WHERE rn = 1
""",
)
def q102_user_event_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value / last_value analytics — per-user
    journey milestones (first, third, last event) in one full-frame
    window. The explicit UNBOUNDED..UNBOUNDED frame matters: the
    default frame stops at CURRENT ROW, which would make last/nth
    row-dependent. All four window functions plus the row_number
    emitter share ONE user_id exchange; nth_value of a missing
    position is NULL in both engines."""
    e = te(spark, sf_dir)
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.first("event_id").over(full).alias("first_event_id"),
            F.nth_value("event_id", 3).over(full).alias("third_event_id"),
            F.last("event_id").over(full).alias("last_event_id"),
            F.count(F.lit(1)).over(full).cast("bigint").alias("n_events"),
            F.row_number().over(seq).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q106_iqr_outliers",
    tags=("events", "quality", "percentile", "outliers"),
    oracle=f"""
WITH e2 AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vq
  FROM events WHERE event_type IS NOT NULL
),
vh AS (
  {sql_int_hist('(SELECT * FROM e2 WHERE vq IS NOT NULL)', 'vq',
                'event_type')}
),
bounds AS (
  SELECT event_type,
         {sql_at_rank('vq', 1, 4)} AS q1,
         {sql_at_rank('vq', 3, 4)} AS q3
  FROM vh GROUP BY event_type
),
fences AS (
  SELECT event_type,
         CAST(5 * q1 - 3 * q3 AS BIGINT) AS lower_fence2_q,
         CAST(5 * q3 - 3 * q1 AS BIGINT) AS upper_fence2_q
  FROM bounds
)
SELECT e.event_type,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN 2 * e.vq < b.lower_fence2_q
                       OR 2 * e.vq > b.upper_fence2_q
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       MIN(b.lower_fence2_q) AS lower_fence2_q,
       MIN(b.upper_fence2_q) AS upper_fence2_q
FROM e2 e LEFT JOIN fences b ON b.event_type = e.event_type
GROUP BY e.event_type
""",
)
def q106_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screening per event type — the numeric
    data-quality gate (flag readings outside [q1−1.5·IQR, q3+1.5·IQR])
    run before a metrics column is trusted for training.

    r8 rewrite (q166's de-float): the quartiles were interpolated
    percentiles — engine-version ulp-fragile in both the emitted
    fences and the fence comparisons. Now integer-exact: values
    quantize by FLOOR(v·1e6); q1/q3 are discrete rank statistics
    (at_rank over the per-type int_hist); and the 1.5·IQR fences are
    carried at 2× scale so they stay integers — lower2 = 5q1 − 3q3,
    upper2 = 5q3 − 3q1 (2·(q ∓ 1.5·(q3−q1))), compared against 2·vq.
    A type whose values are all NULL keeps its row (NULL fences,
    0 outliers) via LEFT joins in both engines.

    Shape unchanged: per-type bounds are a tiny aggregate over the
    value-domain-bounded histogram, BROADCAST back onto the event
    scan; the final count is one partial-agg exchange. At 100 TB swap
    approx_percentile (q29's sketch contract) for the audit-exact
    ranks without touching the fence logic."""
    e2 = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(1_000_000.0))
            .cast("bigint")
            .alias("vq"),
        )
    )
    vh = int_hist(e2.filter(F.col("vq").isNotNull()), "vq", "event_type")
    bounds = vh.groupBy("event_type").agg(
        at_rank("vq", 1, 4).alias("q1"), at_rank("vq", 3, 4).alias("q3")
    )
    fences = bounds.select(
        F.col("event_type").alias("_et"),
        (F.lit(5) * F.col("q1") - F.lit(3) * F.col("q3"))
        .cast("bigint")
        .alias("lower_fence2_q"),
        (F.lit(5) * F.col("q3") - F.lit(3) * F.col("q1"))
        .cast("bigint")
        .alias("upper_fence2_q"),
    )
    # when/otherwise, not a boolean cast: a NULL vq must contribute 0
    # (the oracle's CASE ... ELSE 0), never a NULL the SUM would skip —
    # an all-NULL type would emit SUM()=NULL in Spark but 0 in DuckDB.
    out_flag = F.when(
        (F.lit(2) * F.col("vq") < F.col("lower_fence2_q"))
        | (F.lit(2) * F.col("vq") > F.col("upper_fence2_q")),
        1,
    ).otherwise(0)
    return (
        e2.join(
            F.broadcast(fences), e2["event_type"] == F.col("_et"), "left"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(out_flag).cast("bigint").alias("n_outliers"),
            F.min("lower_fence2_q").alias("lower_fence2_q"),
            F.min("upper_fence2_q").alias("upper_fence2_q"),
        )
        .select(
            "event_type",
            "n_total",
            "n_outliers",
            "lower_fence2_q",
            "upper_fence2_q",
        )
    )


@register(
    "q112_merge_upsert",
    tags=("events", "merge", "upsert", "cdc"),
    oracle="""
WITH target AS (
  SELECT user_id, value, ts AS updated_at FROM (
    SELECT user_id, value, ts, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 2 = 0
  ) WHERE rn = 1
),
source AS (
  SELECT user_id, value, ts AS updated_at FROM (
    SELECT user_id, value, ts, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 2 = 1
  ) WHERE rn = 1
)
SELECT COALESCE(t.user_id, s.user_id) AS user_id,
       CASE WHEN s.user_id IS NULL THEN t.value
            WHEN t.user_id IS NULL THEN s.value
            WHEN s.updated_at >= t.updated_at THEN s.value
            ELSE t.value END AS value,
       CASE WHEN s.user_id IS NULL THEN t.updated_at
            WHEN t.user_id IS NULL THEN s.updated_at
            WHEN s.updated_at >= t.updated_at THEN s.updated_at
            ELSE t.updated_at END AS updated_at,
       CASE WHEN t.user_id IS NULL THEN 'insert'
            WHEN s.user_id IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM target t FULL OUTER JOIN source s ON s.user_id = t.user_id
""",
)
def q112_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics without a table format: a CDC updates
    batch (odd event_ids) merged into a per-user snapshot (even
    event_ids) — newer timestamp wins, unmatched source rows insert,
    unmatched target rows persist, and every output row is labeled
    insert/update/keep. This is the WHEN MATCHED / WHEN NOT MATCHED
    dataflow a lakehouse MERGE INTO compiles to: per-side latest-wins
    pre-aggregation, then ONE full-outer join on the key.

    Scale shape: both pre-aggregations are partial-agg hash aggs; the
    full-outer join shuffles once on user_id (both sides already
    user_id-partitioned from their aggs, so AQE reuses the
    partitioning). Deterministic: latest-wins ties break on
    (ts, event_id) via max_by's struct ordering — same tuple order as
    DuckDB's arg_max."""
    e = t(spark, sf_dir, "events")

    def snapshot(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.expr("max_by(value, struct(ts, event_id))").alias("value"),
            F.max("ts").alias("updated_at"),
        )

    tgt = snapshot(e.filter(F.col("event_id") % 2 == 0)).select(
        F.col("user_id").alias("t_user_id"),
        F.col("value").alias("t_value"),
        F.col("updated_at").alias("t_updated_at"),
    )
    src = snapshot(e.filter(F.col("event_id") % 2 == 1)).select(
        F.col("user_id").alias("s_user_id"),
        F.col("value").alias("s_value"),
        F.col("updated_at").alias("s_updated_at"),
    )
    j = tgt.join(src, F.col("t_user_id") == F.col("s_user_id"), "full_outer")
    s_missing = F.col("s_user_id").isNull()
    t_missing = F.col("t_user_id").isNull()
    s_wins = F.col("s_updated_at") >= F.col("t_updated_at")
    return j.select(
        F.coalesce("t_user_id", "s_user_id").alias("user_id"),
        F.when(s_missing, F.col("t_value"))
        .when(t_missing, F.col("s_value"))
        .when(s_wins, F.col("s_value"))
        .otherwise(F.col("t_value"))
        .alias("value"),
        F.when(s_missing, F.col("t_updated_at"))
        .when(t_missing, F.col("s_updated_at"))
        .when(s_wins, F.col("s_updated_at"))
        .otherwise(F.col("t_updated_at"))
        .alias("updated_at"),
        F.when(t_missing, F.lit("insert"))
        .when(s_missing, F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


@register(
    "q116_event_transitions",
    tags=("events", "window", "markov", "transitions"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS n_transitions,
       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY prev_type)
         AS p_next
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
)
def q116_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    counts and conditional probabilities of event-type bigrams per user
    journey — the behavior-model fit (and the input to next-event
    prediction baselines).

    Shape: ONE user_id window for the lag, then a (prev, next) hash agg
    and a row-normalizing count window over prev_type — the probability
    denominator is a SUM of already-aggregated counts (5x5 rows), so
    the second window is trivial. p_next is exact-integer division in
    double: engine-identical."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    denom = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(denom)
        ).alias("p_next"),
    )


_AS_OF_TS = "2024-01-20 00:00:00"  # mid-stream instant, fixed for determinism


@register(
    "q117_scd2_as_of",
    tags=("events", "scd2", "time-travel", "as-of"),
    oracle=f"""
WITH hist AS (
  SELECT user_id, event_id, value,
         ts AS valid_from,
         lead(ts) OVER w AS valid_to
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS version_event_id, value,
       valid_from
FROM hist
WHERE valid_from <= TIMESTAMP '{_AS_OF_TS}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_AS_OF_TS}')
""",
)
def q117_scd2_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over the SCD2 history q88 builds: the exact
    per-user version valid AS OF a fixed instant ([valid_from,
    valid_to) interval containment) — the query side of slowly-changing
    dimensions, and the semantics a lakehouse "VERSION AS OF" resolves
    to for dimension tables.

    Shape: the same single user_id window as the build, then a
    map-side interval filter — no join, no second exchange. At scale
    the history table is materialized once (q88) and this read prunes
    on valid_from/valid_to min/max parquet statistics."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    as_of = F.lit(_AS_OF_TS).cast("timestamp")
    hist = e.select(
        "user_id",
        F.col("event_id").alias("version_event_id"),
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return hist.filter(
        (F.col("valid_from") <= as_of)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > as_of))
    ).select("user_id", "version_event_id", "value", "valid_from")


@register(
    "q123_hourly_anomaly_zscore",
    tags=("events", "llm-data", "anomaly", "zscore"),
    oracle="""
WITH hourly AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS sum_c,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2
  FROM hourly GROUP BY 1
)
SELECT h.event_type, h.hour, h.cnt,
       CASE WHEN s.n_hours * s.sum_c2 - s.sum_c * s.sum_c > 0
            THEN CAST(h.cnt * s.n_hours - s.sum_c AS DOUBLE)
                 / sqrt(CAST(s.n_hours * s.sum_c2 - s.sum_c * s.sum_c
                             AS DOUBLE))
            ELSE 0.0 END AS z_score,
       CASE WHEN s.n_hours * s.sum_c2 - s.sum_c * s.sum_c > 0
             AND abs(CAST(h.cnt * s.n_hours - s.sum_c AS DOUBLE)
                     / sqrt(CAST(s.n_hours * s.sum_c2 - s.sum_c * s.sum_c
                                 AS DOUBLE))) >= 2.0
            THEN 1 ELSE 0 END AS is_anomaly
FROM hourly h JOIN stats s USING (event_type)
""",
)
def q123_hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly screen: per-hour event counts z-scored against
    that event type's own hourly distribution — the monitoring query a
    training-data ingest pipeline runs to catch crawler outages and
    spam floods before they skew the corpus mix.

    Determinism: the z-score is a SCALAR over exact integers — the
    population moments stay as BIGINT sums (n·Σc² − (Σc)² never
    touches a float), and the single divide + sqrt at the end is the
    same IEEE op in both engines, so no dsum/qsum laundering is
    needed anywhere.

    Scale shape: the hourly rollup is the only data-sized exchange
    (map-side combine on low-cardinality (event_type, hour) keys —
    even a century of hours x 1e3 types is <1e9 groups); the per-type
    moments reduce THAT tiny relation and broadcast back, so the join
    adds no shuffle. Hours with zero events are absent by design —
    rate stats over observed hours; compose with q100's spine
    generator when silent-hour detection is the goal."""
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("cnt").alias("sum_c"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_c2"),
    )
    num = F.col("n_hours") * F.col("sum_c2") - F.col("sum_c") * F.col("sum_c")
    dev = (F.col("cnt") * F.col("n_hours") - F.col("sum_c")).cast("double")
    z = F.when(num > 0, dev / F.sqrt(num.cast("double"))).otherwise(F.lit(0.0))
    return hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour",
        "cnt",
        z.alias("z_score"),
        F.when((num > 0) & (F.abs(z) >= 2.0), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_anomaly"),
    )


@register(
    "q130_next_event_training_pairs",
    tags=("events", "llm-data", "sequence", "window"),
    oracle="""
WITH lagged AS (
  SELECT user_id, event_id, event_type,
         lag(event_type, 3) OVER w AS c1,
         lag(event_type, 2) OVER w AS c2,
         lag(event_type, 1) OVER w AS c3
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       c1 || '>' || c2 || '>' || c3 AS context,
       event_type AS next_event
FROM lagged
WHERE c1 IS NOT NULL AND c2 IS NOT NULL AND c3 IS NOT NULL
""",
)
def q130_next_event_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(context, next) training-pair extraction for sequence models:
    each event paired with its user's three preceding event types —
    the order-3 generalization of q116's Markov bigrams, and the
    dataset-construction step a behavioral-sequence model trains on.

    Scale shape: three lag windows share ONE user_id exchange (same
    partitioning, same sort — Catalyst plans a single Window node), and
    the context concat + completeness filter run map-side on the
    windowed output. No joins, no second shuffle, regardless of
    corpus size."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type", 3).over(w).alias("c1"),
        F.lag("event_type", 2).over(w).alias("c2"),
        F.lag("event_type", 1).over(w).alias("c3"),
    )
    return lagged.filter(
        F.col("c1").isNotNull()
        & F.col("c2").isNotNull()
        & F.col("c3").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.concat_ws(">", "c1", "c2", "c3").alias("context"),
        F.col("event_type").alias("next_event"),
    )


_DRIFT_Q = 10**6  # chi-square term quantization


@register(
    "q131_distribution_drift",
    tags=("events", "llm-data", "drift", "chi-square"),
    oracle=f"""
WITH a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_a
  FROM events WHERE event_id % 2 = 0 GROUP BY event_type
),
b AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_b
  FROM events WHERE event_id % 2 = 1 GROUP BY event_type
),
tot AS (
  SELECT (SELECT CAST(SUM(cnt_a) AS BIGINT) FROM a) AS tot_a,
         (SELECT CAST(SUM(cnt_b) AS BIGINT) FROM b) AS tot_b
)
SELECT COALESCE(a.event_type, b.event_type) AS event_type,
       COALESCE(a.cnt_a, 0) AS cnt_a,
       COALESCE(b.cnt_b, 0) AS cnt_b,
       CASE WHEN COALESCE(a.cnt_a, 0) > 0 THEN
         CAST(floor({float(_DRIFT_Q)!r}
           * (CAST(COALESCE(b.cnt_b, 0) AS DOUBLE)
              - CAST(a.cnt_a * t.tot_b AS DOUBLE) / t.tot_a)
           * (CAST(COALESCE(b.cnt_b, 0) AS DOUBLE)
              - CAST(a.cnt_a * t.tot_b AS DOUBLE) / t.tot_a)
           / (CAST(a.cnt_a * t.tot_b AS DOUBLE) / t.tot_a)) AS BIGINT)
       ELSE NULL END AS chi2_q
FROM a FULL OUTER JOIN b ON a.event_type = b.event_type, tot t
""",
)
def q131_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift screen between two corpus snapshots (split
    here by event_id parity as the deterministic stand-in for
    week-over-week partitions): per-category chi-square contribution of
    the new snapshot against the old snapshot's proportions — the gate
    that catches a source suddenly flooding one event type before it
    skews a training mix.

    Determinism: counts and totals stay BIGINT; the expected count,
    deviation and chi-square term are ONE scalar IEEE chain evaluated
    identically in both engines, then floor-quantized to BIGINT for
    the compare surface. Categories absent from the baseline emit NULL
    (new category = infinite-drift sentinel, flagged not divided).

    Scale shape: two map-side-combined count aggs over low-cardinality
    keys, a full-outer join of two |categories|-sized relations, and a
    1-row totals broadcast — nothing data-sized past the first aggs."""
    e = t(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt_a"))
    )
    b = (
        e.filter(F.col("event_id") % 2 == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt_b"))
    )
    tot = a.agg(F.sum("cnt_a").alias("tot_a")).crossJoin(
        b.agg(F.sum("cnt_b").alias("tot_b"))
    )
    j = (
        a.withColumnRenamed("event_type", "et_a")
        .join(
            b.withColumnRenamed("event_type", "et_b"),
            F.col("et_a") == F.col("et_b"),
            "full_outer",
        )
        .crossJoin(F.broadcast(tot))
    )
    cnt_a = F.coalesce(F.col("cnt_a"), F.lit(0))
    cnt_b = F.coalesce(F.col("cnt_b"), F.lit(0))
    exp = (F.col("cnt_a") * F.col("tot_b")).cast("double") / F.col("tot_a")
    dev = cnt_b.cast("double") - exp
    chi2 = F.when(
        cnt_a > 0,
        F.floor(F.lit(float(_DRIFT_Q)) * dev * dev / exp).cast("bigint"),
    )
    return j.select(
        F.coalesce(F.col("et_a"), F.col("et_b")).alias("event_type"),
        cnt_a.alias("cnt_a"),
        cnt_b.alias("cnt_b"),
        chi2.alias("chi2_q"),
    )


@register(
    "q136_event_value_trend",
    tags=("events", "llm-data", "regression", "trend"),
    oracle="""
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - MIN(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY event_type)
           AS x,
         value AS y
  FROM events
),
m AS (
  -- exact wide-integer sufficient statistics: every per-row product is
  -- formed in HUGEINT (mirrors Spark's per-row DECIMAL(38,0) operand
  -- cast — BIGINT*BIGINT would error loudly once a row's x*qy passes
  -- 2^63), and the group sums stay HUGEINT
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(CAST(FLOOR(y * 1000000.0) AS BIGINT) AS HUGEINT)) AS qsy,
         SUM(CAST(x AS HUGEINT)
             * CAST(FLOOR(y * 1000000.0) AS BIGINT)) AS qsxy
  FROM base GROUP BY event_type
),
-- HUGEINT -> DOUBLE routes through VARCHAR: DuckDB's direct cast is not
-- correctly rounded above 2^64 (r10, sql_big_to_double)
d AS (
  SELECT event_type, n,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dsx,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dsxx,
         CAST(CAST(qsy AS VARCHAR) AS DOUBLE) AS dqsy,
         CAST(CAST(qsxy AS VARCHAR) AS DOUBLE) AS dqsxy
  FROM m
)
SELECT event_type, n,
       CASE WHEN n * dsxx - dsx * dsx > 0
            THEN (n * (dqsxy / 1000000.0) - dsx * (dqsy / 1000000.0))
                 / (n * dsxx - dsx * dsx)
            ELSE 0.0 END AS slope,
       (dqsy / 1000000.0) / n AS mean_value
FROM d
""",
)
def q136_event_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS trend per event type: least-squares slope of
    event value over time — the drift/trend primitive behind "is this
    metric degrading" monitoring, computed entirely from sufficient
    statistics so one aggregation pass serves any number of groups.

    Determinism: x re-bases to seconds-from-group-min (keeps x² sums
    small and slope scale-free; the oracle floors epoch() BEFORE the
    BIGINT cast because DuckDB's double→BIGINT cast ROUNDS sub-second
    timestamps where Spark's unix_timestamp floors — the half-second
    x shift moved the slope's 7th digit), ALL four moments accumulate
    in DECIMAL(38,0) with every per-row product formed on a decimal
    OPERAND (r10: the previous long x*qy wrapped silently before its
    decimal cast; the oracle mirrors with HUGEINT operands), y-moments
    floor-quantize at 1e6, each moment reaches its wire double through
    ONE correct rounding (Spark decimal→double; oracle VARCHAR route —
    DuckDB's direct HUGEINT cast mis-rounds above 2^64), and the
    closed-form slope is one scalar IEEE chain from those exact
    values. Degenerate groups (single instant) emit slope 0 instead
    of 0/0.

    Scale shape: one event_type window for the re-base min shares its
    exchange with the moments aggregate (same key), so the whole query
    is ONE data-sized shuffle with map-side partial aggregation; output
    is |event types| rows."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    x = (
        F.unix_timestamp("ts").cast("bigint")
        - F.min(F.unix_timestamp("ts").cast("bigint")).over(w)
    )
    qy = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
    base = e.select("event_type", x.alias("x"), qy.alias("qy"))
    # ALL power sums accumulate in DECIMAL(38,0) (r9: the sf1 scale run
    # errored ARITHMETIC_OVERFLOW on the long qsxy sum at 200k
    # rows/group — per-row x*qy ~ 2.6e15 is fine in long, the GROUP sum
    # is not; the oracle's SUM(BIGINT) was already HUGEINT-exact).
    # Wire values are unchanged: each emitted double rounds the same
    # exact integer either way.
    m = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("qy").cast("decimal(38,0)")).alias("qsy"),
        # the operand (not the product) casts to decimal so the per-row
        # x*qy is exact like sxx one line up — a long*long product wraps
        # silently past 2^63 before the decimal cast ever sees it
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("qy")).alias("qsxy"),
    )
    det = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    slope = (
        F.col("n") * (F.col("qsxy").cast("double") / F.lit(1e6))
        - F.col("sx").cast("double") * (F.col("qsy").cast("double") / F.lit(1e6))
    ) / det
    return m.select(
        "event_type",
        "n",
        F.when(det > 0, slope).otherwise(F.lit(0.0)).alias("slope"),
        ((F.col("qsy").cast("double") / F.lit(1e6)) / F.col("n")).alias(
            "mean_value"
        ),
    )


_EWMA_LOOKBACK = 10  # events; weight 2^-j halves per step back


@register(
    "q137_ewma_event_value",
    tags=("events", "llm-data", "ewma", "window"),
    oracle=f"""
WITH q AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS qy
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
),
l AS (
  SELECT user_id, event_id,
         {", ".join(f"lag(qy, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y{j}" for j in range(10))}
  FROM q
)
SELECT user_id, event_id,
       CAST(({" + ".join(f"COALESCE(y{j}, 0) * {1 << (9 - j)}" for j in range(10))}) AS DOUBLE)
       / ({" + ".join(f"(CASE WHEN y{j} IS NULL THEN 0 ELSE {1 << (9 - j)} END)" for j in range(10))})
       / 1000000.0 AS ewma
FROM l
""",
)
def q137_ewma_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event value over each
    user's last {_EWMA_LOOKBACK} events (decay 1/2 per step) — the
    smoothed-signal feature behind engagement scores and rate alarms.

    Determinism trick: the weights are DYADIC (2^-j), so scaling by
    2^9 turns the whole weighted sum into BIGINT arithmetic — numerator
    and denominator are exact integers built from an EXPLICIT addition
    chain over the lags (no SUM over computed doubles anywhere), and
    the single final divide is IEEE-identical cross-engine. A general
    alpha would need libm pow — rejected for the same ulp reasons as
    q126's entropy.

    Scale shape: all {_EWMA_LOOKBACK} lags share ONE user_id window
    exchange (same partitioning + ordering); everything after is a
    map-side scalar chain."""
    e = te(spark, sf_dir)
    qy = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = e.select("user_id", "event_id", "ts", qy.alias("qy"))
    lags = q.select(
        "user_id",
        "event_id",
        *[
            F.lag("qy", j).over(w).alias(f"y{j}")
            for j in range(_EWMA_LOOKBACK)
        ],
    )
    num = None
    den = None
    for j in range(_EWMA_LOOKBACK):
        wgt = 1 << (9 - j)
        tn = F.coalesce(F.col(f"y{j}"), F.lit(0)) * F.lit(wgt)
        td = F.when(F.col(f"y{j}").isNull(), F.lit(0)).otherwise(F.lit(wgt))
        num = tn if num is None else num + tn
        den = td if den is None else den + td
    return lags.select(
        "user_id",
        "event_id",
        (num.cast("double") / den / F.lit(1e6)).alias("ewma"),
    )


# Experiment arm assignment — ONE definition for the experiment (q140),
# its funnel diagnosis (q149) and its SRM hygiene check (q177): the SRM
# check is only meaningful if it audits the exact randomization the
# experiment used, so all three Spark sides call _arm_col() and an
# import-time guard pins every oracle to the canonical SQL fragment.
_SQL_ARM_HASH = (
    "('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT"
)


def _arm_col():
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )


@register(
    "q140_ab_test_conversion",
    tags=("events", "llm-data", "experimentation", "ab-test"),
    oracle="""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS arm
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN n_a > 0 AND n_b > 0
             AND (conv_a + conv_b) > 0
             AND (conv_a + conv_b) < (n_a + n_b)
            THEN (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b))
            ELSE 0.0 END AS z_stat
FROM agg
""",
)
def q140_ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users split into
    arms by md5 (content-addressed, the same reshuffle-stable
    assignment discipline as q39's split), conversion = at least one
    purchase, pooled-variance z on the conversion-rate difference —
    the readout primitive for any data-pipeline experiment (new dedup
    threshold, new quality gate) shipped behind a user split.

    Determinism: arm assignment and all four cells are exact integers
    from ONE user-level aggregate; the z statistic is a single scalar
    IEEE chain over them. Degenerate designs (empty arm, all-or-none
    conversion) emit z = 0 instead of dividing by zero.

    Scale shape: one user_id map-side-combined aggregate (conv flag +
    arm are in-row), then a 4-cell global aggregate — the classic
    two-level rollup, nothing data-sized past the first exchange."""
    e = t(spark, sf_dir, "events")
    arm = _arm_col()
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select("user_id", "conv", arm.alias("arm"))
    agg = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    tot_conv = F.col("conv_a") + F.col("conv_b")
    tot_n = F.col("n_a") + F.col("n_b")
    p = tot_conv.cast("double") / tot_n
    z = (
        F.col("conv_a").cast("double") / F.col("n_a")
        - F.col("conv_b").cast("double") / F.col("n_b")
    ) / F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (tot_conv > 0)
        & (tot_conv < tot_n)
    )
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.when(ok, z).otherwise(F.lit(0.0)).alias("z_stat"),
    )


_DIFF_T1 = "2024-01-10 00:00:00"
_DIFF_T2 = "2024-01-20 00:00:00"


@register(
    "q143_snapshot_diff",
    tags=("events", "scd2", "time-travel", "diff"),
    oracle=f"""
WITH hist AS (
  SELECT user_id, event_id AS version_event_id, value,
         ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events
),
s1 AS (
  SELECT user_id, version_event_id, value FROM hist
  WHERE valid_from <= TIMESTAMP '{_DIFF_T1}'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_DIFF_T1}')
),
s2 AS (
  SELECT user_id, version_event_id, value FROM hist
  WHERE valid_from <= TIMESTAMP '{_DIFF_T2}'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_DIFF_T2}')
)
SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
       s1.version_event_id AS version_t1,
       s2.version_event_id AS version_t2,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.version_event_id <> s2.version_event_id THEN 'changed'
            ELSE 'same' END AS change_type
FROM s1 FULL OUTER JOIN s2 ON s2.user_id = s1.user_id
""",
)
def q143_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel DIFF between two SCD2 as-of snapshots — "what
    changed between T1 and T2" is the audit query every versioned
    current-state table (q88 build / q117 read / the streaming MERGE
    sink) owes its consumers: keys added, removed, or re-versioned in
    the interval.

    Shape: BOTH as-of reads come from the SAME versioned history (one
    user_id window exchange computes valid_from/valid_to once; the two
    interval filters are map-side projections of that shared subtree),
    then one key-partitioned full-outer join classifies each key. At
    100 TB the history is materialized once (q88) and both reads prune
    on valid_from/valid_to parquet min/max."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = e.select(
        "user_id",
        F.col("event_id").alias("version_event_id"),
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).localCheckpoint(eager=False)

    def as_of(ts_lit: str) -> DataFrame:
        ts = F.lit(ts_lit).cast("timestamp")
        return hist.filter(
            (F.col("valid_from") <= ts)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
        ).select("user_id", "version_event_id")

    s1 = as_of(_DIFF_T1).select(
        F.col("user_id").alias("u1"), F.col("version_event_id").alias("version_t1")
    )
    s2 = as_of(_DIFF_T2).select(
        F.col("user_id").alias("u2"), F.col("version_event_id").alias("version_t2")
    )
    j = s1.join(s2, F.col("u1") == F.col("u2"), "full_outer")
    return j.select(
        F.coalesce(F.col("u1"), F.col("u2")).alias("user_id"),
        "version_t1",
        "version_t2",
        F.when(F.col("u1").isNull(), F.lit("added"))
        .when(F.col("u2").isNull(), F.lit("removed"))
        .when(F.col("version_t1") != F.col("version_t2"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("change_type"),
    )


@register(
    "q148_activity_gini",
    tags=("events", "llm-data", "concentration", "gini"),
    oracle="""
WITH uc AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x ASC, user_id ASC) AS i
  FROM uc
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS total_events,
         CAST(SUM(i * x) AS BIGINT) AS weighted
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_users, total_events,
       2.0e0 * CAST(weighted AS DOUBLE)
         / (CAST(n_users AS DOUBLE) * total_events)
         - (CAST(n_users + 1 AS DOUBLE) / n_users) AS gini
FROM agg
""",
)
def q148_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity within each event type —
    the concentration screen that tells a pipeline whether a signal is
    organic (activity spread across users, Gini near 0) or dominated by
    a handful of power users / bots (Gini near 1), which changes
    whether you trust it for training labels.

    Determinism: the rank-weighted sum Σi·x_i is invariant to tie order
    (equal x values swap equal weights across a contiguous rank block),
    and the tie-break on user_id makes both engines' rankings literally
    identical anyway; the final Gini = 2Σix/(nΣx) − (n+1)/n is one
    scalar chain over exact BIGINTs, with 2.0e0 spelled as a double
    literal (the q144 DECIMAL trap).

    Scale shape: the per-(type, user) rollup is the only corpus-sized
    exchange (map-side combined); the rank window and the final
    aggregate both run on the ALREADY AGGREGATED user-count relation
    and share its event_type partitioning."""
    e = t(spark, sf_dir, "events")
    uc = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("x").asc(), F.col("user_id").asc()
    )
    ranked = uc.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("total_events"),
        F.sum(F.col("i") * F.col("x")).alias("weighted"),
    )
    gini = F.lit(2.0) * F.col("weighted").cast("double") / (
        F.col("n_users").cast("double") * F.col("total_events")
    ) - (F.col("n_users") + 1).cast("double") / F.col("n_users")
    return agg.select(
        "event_type", "n_users", "total_events", gini.alias("gini")
    )


@register(
    "q149_funnel_by_arm",
    tags=("events", "llm-data", "experimentation", "funnel"),
    oracle="""
WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS arm,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM events GROUP BY user_id
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clickers,
       CAST(SUM(CASE WHEN first_click IS NOT NULL
                      AND last_purchase IS NOT NULL
                      AND last_purchase > first_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN first_click IS NOT NULL
                      AND last_purchase IS NOT NULL
                      AND last_purchase > first_click
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / greatest(SUM(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END), 1)
         AS conv_rate
FROM u GROUP BY arm
""",
)
def q149_funnel_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion BY EXPERIMENT ARM — q140's z-test gives the
    verdict, this gives the diagnosis: per md5-split arm, how many
    users clicked, and how many purchased strictly AFTER their first
    click (ordered conversion, not mere co-occurrence — the q86 funnel
    discipline applied to the experiment readout).

    Determinism: per-user min/max timestamps and flags reduce exactly;
    arm assignment is the q140 md5 split; the rate is one scalar
    divide guarded by greatest(n,1). Scale shape: ONE user_id rollup
    with map-side combine, then a 2-row arm aggregate."""
    e = t(spark, sf_dir, "events")
    arm = _arm_col()
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    ).select("user_id", "first_click", "last_purchase", arm.alias("arm"))
    clicked = F.col("first_click").isNotNull()
    converted = (
        clicked
        & F.col("last_purchase").isNotNull()
        & (F.col("last_purchase") > F.col("first_click"))
    )
    agg = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("bigint").alias("n_clickers"),
        F.sum(F.when(converted, 1).otherwise(0))
        .cast("bigint")
        .alias("n_converted"),
    )
    return agg.select(
        "arm",
        "n_users",
        "n_clickers",
        "n_converted",
        (
            F.col("n_converted").cast("double")
            / F.greatest(F.col("n_clickers"), F.lit(1))
        ).alias("conv_rate"),
    )


@register(
    "q151_rolling_weekly_actives",
    tags=("events", "llm-data", "rolling-distinct", "range-join"),
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d
JOIN du u
  ON u.day <= d.day AND u.day > d.day - INTERVAL '7 days'
GROUP BY d.day
""",
)
def q151_rolling_weekly_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the engagement series every
    dashboard wants, and the canonical example of a metric a window
    frame CANNOT give you: distinct counts don't decompose over
    sliding sums, so the exact form is a (day x trailing-week) range
    join over the DEDUPLICATED (day, user) relation.

    Scale shape: the corpus reduces to distinct (day, user) FIRST (one
    map-side-combined exchange, output bounded by days x users); the
    range join then fans each row out to <= 7 day anchors before the
    per-day distinct count. At 100 TB the fan-out relation is 7x
    (days x active users) — still corpus-independent — and the
    sketched alternative (per-day HLL merged over 7 days) is the q29
    family's job when exactness can yield."""
    e = t(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct().select(F.col("day").alias("anchor"))
    joined = du.join(
        days,
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") > F.date_sub(F.col("anchor"), 7)),
    )
    return joined.groupBy(F.col("anchor").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )


@register(
    "q201_rolling_weekly_actives_sketch",
    tags=("events", "llm-data", "rolling-distinct", "sketch", "hll"),
    oracle=None,  # sketch bits are engine-specific -> rows-only + in-plan
    #               bound asserts vs the exact columns (q29's discipline)
    oracle_twin="q151_rolling_weekly_actives",
)
def q201_rolling_weekly_actives_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q151's 100 TB form: rolling 7-day actives via MERGEABLE HLL
    sketches (DataSketches ``hll_sketch_agg``/``hll_union_agg``) instead
    of the exact range-join fan-out. The exact plan fans the distinct
    (day, user) relation ≤7× before a per-day COUNT(DISTINCT) — fine at
    bench scale, but the fan-out is 7 × (days × active users) rows. The
    sketch plan reduces each day to ONE fixed-size (2^lgK bytes) sketch
    first, range-joins only the DAY-level sketch relation (≤ 7 ×
    n_days rows total, corpus-independent), and merges — distinct
    counts don't decompose over sliding sums, but sketch UNION does,
    which is exactly why sketches exist.

    Not unfalsifiable: the same plan carries the exact q151 range-join
    as a twin branch and emits ``within_bound`` per day — |approx −
    exact| / exact ≤ 3σ of the published DataSketches HLL relative
    standard error 1.04/√(2^lgK) (≈1.63% at lgK=12). test_catalog
    asserts every day's bound at two scales; the driver's rows-only
    check covers shape. SCALING.md's "HLL swap" row points HERE."""
    _LG_K = 12
    _RSD = 1.04 / (2 ** (_LG_K / 2.0))
    e = t(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    # one fixed-size sketch per day (single corpus exchange, map-side
    # partial sketches merge in the agg)
    daily = du.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk")
    )
    days = daily.select(F.col("day").alias("anchor"))
    sk_joined = daily.join(
        days,
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") > F.date_sub(F.col("anchor"), 7)),
    )
    approx = sk_joined.groupBy(F.col("anchor").alias("day")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("wau_sketch")
    )
    # exact twin branch (q151's plan verbatim) for the in-plan bound
    exact_joined = du.join(
        days,
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") > F.date_sub(F.col("anchor"), 7)),
    )
    exact = exact_joined.groupBy(F.col("anchor").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau_exact")
    )
    err = (
        F.abs(F.col("wau_sketch") - F.col("wau_exact"))
        / F.col("wau_exact").cast("double")
    )
    # wau_exact = 0 (a window whose only users are NULL — both
    # countDistinct and hll_sketch_agg skip NULLs) makes err NaN;
    # the bound there is simply "the sketch also says 0".
    within = F.when(
        F.col("wau_exact") == 0, F.col("wau_sketch") == 0
    ).otherwise(err <= 3 * _RSD)
    return (
        approx.join(exact, "day")
        .select(
            "day",
            "wau_sketch",
            "wau_exact",
            within.alias("within_bound"),
        )
    )


@register(
    "q152_event_gap_histogram",
    tags=("events", "llm-data", "histogram", "cadence"),
    oracle="""
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(LENGTH(bin(CAST(gap_us // 1000000 AS BIGINT))) - 1 AS INT)
         AS log2_gap_s,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps
WHERE gap_us IS NOT NULL AND gap_us >= 1000000
GROUP BY event_type, log2_gap_s
""",
)
def q152_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence histogram: per event type, the distribution
    of same-user gaps in floor(log2(seconds)) buckets — the sessioniz-
    ation-threshold tuning chart (q62's 30-minute gap is a guess until
    this histogram shows where the bimodal split actually sits).

    Exactness: gaps are integer microseconds (q47's discipline),
    bucket = binary-digit-count of whole seconds (q76's libm-free
    floor(log2)); sub-second gaps are excluded so the log bucket is
    always well-defined on a positive integer. The oracle floors via
    integer division (//): DuckDB's double->BIGINT cast ROUNDS, which
    flipped a 127.6 s gap into the 128-255 s bucket (the same rounding
    trap as q136's epoch cast).

    Scale shape: one user_id window exchange for the lag, then one
    (type, bucket) hash agg with map-side combine."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") >= 1_000_000))
    bucket = (
        F.length(F.bin((F.col("gap_us") / 1_000_000).cast("bigint"))) - 1
    ).cast("int")
    return gaps.groupBy("event_type", bucket.alias("log2_gap_s")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@register(
    "q153_audience_overlap",
    tags=("events", "llm-data", "audience", "jaccard"),
    oracle="""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM tu GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_common,
       sa.n_users AS n_a, sb.n_users AS n_b,
       CAST(i.n_common AS DOUBLE)
         / (sa.n_users + sb.n_users - i.n_common) AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
""",
)
def q153_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the USER SETS
    behind each pair of event types — the segmentation readout that
    says whether two behaviors share a population (error-viewers ==
    purchasers?) before anyone builds a joint model on them.

    Shape: the corpus reduces to distinct (type, user) FIRST; the pair
    join keys on user_id (both sides the SAME small exchange —
    per-user fan-out is bounded by |event types|), sizes broadcast
    back, and Jaccard is exact integers with one scalar divide. The
    same inverted-index discipline as q48, with users playing the
    postings."""
    e = t(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = tu.alias("a")
    b = tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@register(
    "q157_session_trigrams",
    tags=("events", "llm-data", "sequence-mining"),
    oracle="""
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM s
),
tri AS (
  SELECT lag(event_type, 2) OVER w2 AS e1,
         lag(event_type, 1) OVER w2 AS e2,
         event_type AS e3
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
FROM tri
WHERE e1 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC
LIMIT 20
""",
)
def q157_session_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 within-session event-type trigrams: the sequential-
    pattern-mining readout one level up from q116's Markov pairs —
    'view->click->purchase vs view->click->error' is the difference
    between a working funnel and a broken one, and these counts are
    the training corpus for next-event models (q130) with session
    boundaries respected (no trigram spans a 30-minute gap).

    Shape: the sessionize window and the trigram window BOTH cluster
    by user_id — hashpartitioning(user_id) satisfies the (user_id,
    session_id) clustering requirement, so Catalyst inserts ONE
    exchange and a re-sort, never a second shuffle (asserted in
    tests/test_plan_shapes.py). The trigram count is a hash agg on a
    |event_types|^3-bounded key space, then global top-20 via
    TakeOrdered with full lexical tie-break."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tri = sess.select(
        F.lag("event_type", 2).over(w2).alias("e1"),
        F.lag("event_type", 1).over(w2).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(20)
    )


@register(
    "q159_value_mad_outliers",
    tags=("events", "quality", "percentile", "outliers"),
    oracle=f"""
WITH e2 AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vq
  FROM events WHERE event_type IS NOT NULL
),
vh AS (
  {sql_int_hist('(SELECT * FROM e2 WHERE vq IS NOT NULL)', 'vq',
                'event_type')}
),
med AS (
  SELECT event_type, {sql_med2('vq')} AS m2
  FROM vh GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.vq, m.m2, ABS(2 * e.vq - m.m2) AS a2
  FROM e2 e LEFT JOIN med m ON m.event_type = e.event_type
),
ah AS (
  {sql_int_hist('(SELECT event_type, a2 FROM dev WHERE a2 IS NOT NULL)',
                'a2', 'event_type')}
),
mad AS (
  SELECT event_type, {sql_med2('a2')} AS mad4
  FROM ah GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(MIN(d.m2) AS BIGINT) AS median2_q,
       CAST(MIN(m.mad4) AS BIGINT) AS mad4_q,
       CAST(SUM(CASE WHEN d.a2 * 1349 > 3500 * m.mad4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d LEFT JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type
""",
)
def q159_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-z outlier screening via median absolute deviation — the
    heavy-tail-safe sibling of q106's Tukey fences and q123's mean/std
    z-scores (mean and std are themselves corrupted by the outliers
    they're hunting; the median/MAD pair is 50%-breakdown robust).
    Flags |value - median| > 3.5·MAD/0.6745 (the standard 3.5-sigma
    consistency-scaled cut).

    r8 rewrite (q166's de-float): medians were interpolated
    percentiles — the engine-version ulp hazard, and here they fed
    BOTH hashed output columns and the fence comparison. Now exact
    integer midranks end to end: values quantize by FLOOR(v·1e6);
    median2_q = x_⌈n/2⌉ + x_⌊n/2⌋₊₁ (the midrank PAIR SUM — median is
    median2_q/2, no division ever emitted); deviations double once
    (a2 = |2·vq − median2_q|); mad4_q is the same pair sum over the
    deviations (mad = mad4_q/4); and the 3.5σ cut becomes the exact
    integer cross-multiplication a2·1349 > 3500·mad4 (3.5/0.6745 =
    3500/1349·(1/2·1/4 scale-matched)). Headroom: |value| < 3e8 keeps
    every product inside int64 (vq ≤ |v|·1e6, a2 ≤ 4·|v|·1e6, mad4 ≤
    8·|v|·1e6, so 3500·mad4 ≤ 2.8e10·|v| < 2^63 ⇔ |v| < 3.3e8) —
    events.value is bounded by domain; ANSI mode makes any excursion a
    loud error, never a wrap.

    Shape unchanged: two per-type median aggregates (now over the
    value-domain-bounded int_hist instead of a holistic percentile),
    each broadcast back onto the scan — two corpus passes, zero
    corpus-sized shuffles. A type whose values are all NULL keeps its
    row (NULL medians, 0 outliers) via LEFT joins in both engines."""
    e2 = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(1_000_000.0))
            .cast("bigint")
            .alias("vq"),
        )
    )

    def pair_sum(hist: DataFrame, vcol: str, alias: str) -> DataFrame:
        return hist.groupBy("event_type").agg(med2(vcol).alias(alias))

    vh = int_hist(e2.filter(F.col("vq").isNotNull()), "vq", "event_type")
    med = pair_sum(vh, "vq", "m2").withColumnRenamed("event_type", "_et")
    dev = e2.join(
        F.broadcast(med), e2["event_type"] == F.col("_et"), "left"
    ).select(
        "event_type",
        "vq",
        "m2",
        F.abs(F.lit(2) * F.col("vq") - F.col("m2")).alias("a2"),
    )
    ah = int_hist(
        dev.filter(F.col("a2").isNotNull()).select("event_type", "a2"),
        "a2",
        "event_type",
    )
    mad = pair_sum(ah, "a2", "mad4").withColumnRenamed("event_type", "_et")
    joined = dev.join(
        F.broadcast(mad), dev["event_type"] == F.col("_et"), "left"
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.min("m2").cast("bigint").alias("median2_q"),
        F.min("mad4").cast("bigint").alias("mad4_q"),
        F.sum(
            F.when(
                F.col("a2") * F.lit(1349) > F.lit(3500) * F.col("mad4"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


def _sql_corr(x: str, y: str, flt: str) -> str:
    """Pearson r from exact BIGINT sufficient statistics (k, Σx, Σy,
    Σxy, Σx², Σy²) over FILTERed pairs — integer aggregation is
    order-free, the final expression is pinned per-row IEEE."""
    k = f"COUNT(*) FILTER ({flt})"
    sx = f"SUM({x}) FILTER ({flt})"
    sy = f"SUM({y}) FILTER ({flt})"
    sxy = f"SUM({x} * {y}) FILTER ({flt})"
    sxx = f"SUM({x} * {x}) FILTER ({flt})"
    syy = f"SUM({y} * {y}) FILTER ({flt})"
    num = f"(CAST({k} * {sxy} - {sx} * {sy} AS DOUBLE))"
    dx = f"(CAST({k} * {sxx} - {sx} * {sx} AS DOUBLE))"
    dy = f"(CAST({k} * {syy} - {sy} * {sy} AS DOUBLE))"
    return (
        f"CASE WHEN {dx} > 0e0 AND {dy} > 0e0 "
        f"THEN {num} / (sqrt({dx}) * sqrt({dy})) ELSE NULL END"
    )


@register(
    "q164_daily_autocorrelation",
    tags=("events", "timeseries", "agg"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY event_type, day
),
lagged AS (
  SELECT event_type, n,
         lag(n, 1) OVER w AS n1,
         lag(n, 7) OVER w AS n7
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(*) FILTER (n1 IS NOT NULL) AS BIGINT) AS n_lag1_pairs,
       CAST(COUNT(*) FILTER (n7 IS NOT NULL) AS BIGINT) AS n_lag7_pairs,
       {_sql_corr('n', 'n1', 'n1 IS NOT NULL')} AS lag1_r,
       {_sql_corr('n', 'n7', 'n7 IS NOT NULL')} AS lag7_r
FROM lagged
GROUP BY event_type
""",
)
def q164_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily event-count series
    per type — the seasonality screen (lag7_r >> lag1_r says weekly
    cadence; both ≈ 0 says the counts are noise) run before anyone
    fits a forecast or alerts on a 'drop' that is just Sunday.
    Series = observed days only (no gap-fill; q100 is the gap-fill
    twin if a dense spine is wanted).

    Determinism: daily counts are integers, so ALL sufficient
    statistics (k, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINT sums —
    order-free — and Pearson r is one pinned double expression over
    them; zero-variance series yield NULL identically in both engines
    (guarded CASE, never a divide-by-zero Inf/NaN).

    Shape: the corpus collapses to |types|×|days| rows in ONE
    partial-agg exchange; the lag windows and the final per-type agg
    run on that tiny relation (window partitions by event_type —
    satisfied by the agg's own exchange, no second shuffle)."""
    e = te(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 7).over(w).alias("n7"),
    )

    def spark_corr(ycol: str):
        flt = F.col(ycol).isNotNull()
        x = F.when(flt, F.col("n"))
        y = F.when(flt, F.col(ycol))
        k = F.count(y)
        sx = F.sum(x)
        sy = F.sum(y)
        sxy = F.sum(x * F.col(ycol))
        sxx = F.sum(x * F.col("n"))
        syy = F.sum(y * F.col(ycol))
        num = (k * sxy - sx * sy).cast("double")
        dx = (k * sxx - sx * sx).cast("double")
        dy = (k * syy - sy * sy).cast("double")
        return F.when(
            (dx > 0.0) & (dy > 0.0), num / (F.sqrt(dx) * F.sqrt(dy))
        ).otherwise(F.lit(None).cast("double"))

    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.count("n1").cast("bigint").alias("n_lag1_pairs"),
        F.count("n7").cast("bigint").alias("n_lag7_pairs"),
        spark_corr("n1").alias("lag1_r"),
        spark_corr("n7").alias("lag7_r"),
    )


# Integer week index with Monday boundaries, timezone-free: day 0
# (1970-01-01) was a Thursday, so (day + 3) // 7 rolls over on Mondays.
# Shared arithmetic in both engines — immune to the date_trunc('week')
# / dayofweek convention mismatches between dialects.
_SQL_WEEK_IDX = "CAST((epoch_us(ts) // 86400000000 + 3) // 7 AS BIGINT)"


@register(
    "q169_growth_accounting",
    tags=("events", "product-analytics", "retention"),
    oracle=f"""
WITH weekly AS (
  SELECT DISTINCT user_id, {_SQL_WEEK_IDX} AS wk FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
),
seq AS (
  SELECT user_id, wk,
         lag(wk) OVER w AS prev_wk,
         lead(wk) OVER w AS next_wk,
         MIN(wk) OVER (PARTITION BY user_id) AS first_wk
  FROM weekly
  WINDOW w AS (PARTITION BY user_id ORDER BY wk)
)
SELECT wk,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(SUM(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       CAST(SUM(CASE WHEN next_wk IS NULL OR next_wk > wk + 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
FROM seq
GROUP BY wk
""",
)
def q169_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classified as new
    (first-ever week), retained (also active last week) or resurrected
    (returning after a gap), plus the churning count (active now,
    absent next week) — the NEW + RETAINED + RESURRECTED = ACTIVE
    identity that separates 'growing' from 'churning fast while
    acquiring faster'. Final-week caveat: users in the last observed
    week always count as churning (no next week exists) — the standard
    right-censoring artifact, left in deliberately.

    Week boundaries are INTEGER arithmetic on epoch-days ((d+3)//7,
    Monday rollover) — identical in both engines, immune to
    date_trunc('week')/locale drift. Shape: corpus → distinct
    (user, week) partial agg, lag/lead/min windows all on ONE user_id
    exchange, final per-week agg on the tiny weekly relation."""
    e = te(spark, sf_dir)
    day = F.floor(F.unix_micros("ts") / 86_400_000_000)
    wk = F.floor((day + 3) / 7).cast("bigint")
    weekly = e.select("user_id", wk.alias("wk")).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    wall = Window.partitionBy("user_id")
    seq = weekly.select(
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
        F.min("wk").over(wall).alias("first_wk"),
    )
    return seq.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
        F.sum(
            F.when(
                F.col("next_wk").isNull() | (F.col("next_wk") > F.col("wk") + 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_churning"),
    )


@register(
    "q170_dow_uniformity_chi2",
    tags=("events", "timeseries", "stats"),
    oracle="""
WITH dow AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS INT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  GROUP BY event_type, dow
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS INT) AS n_dows_seen,
       CAST(MAX(c) AS BIGINT) AS max_dow_count,
       7e0 * CAST(SUM(c * c) AS DOUBLE) / SUM(c) - CAST(SUM(c) AS DOUBLE)
         AS chi2_uniform
FROM dow
GROUP BY event_type
""",
)
def q170_dow_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality test: Pearson chi-square statistic of
    each event type's weekday histogram against the uniform null —
    the algebraic identity Σ(O−n/7)²/(n/7) = 7·ΣO²/n − n means the
    statistic comes out of exact integer sums with one double divide
    (no expected-count doubles ever aggregated). Read with q164: a
    big chi2 here plus lag7_r ≈ 1 there = real weekly cadence;
    chi2 ≈ 6 (the df) = flat traffic. dow 0 = Monday, integer
    epoch-day arithmetic (no dayofweek() convention drift).

    Shape: ONE (type, dow) partial agg over the corpus — 7·|types|
    rows out — then a |types|-row reduction."""
    e = t(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86_400_000_000)
    dow = ((day + 3) % 7).cast("int")
    per = e.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("c")
    )
    c = F.col("c")
    sc = F.sum(c)
    return per.groupBy("event_type").agg(
        sc.cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("int").alias("n_dows_seen"),
        F.max(c).cast("bigint").alias("max_dow_count"),
        (
            F.lit(7.0) * F.sum(c * c).cast("double") / sc - sc.cast("double")
        ).alias("chi2_uniform"),
    )


@register(
    "q173_dow_seasonal_index",
    tags=("events", "timeseries", "seasonality"),
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS INT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day, dow
),
per_dow AS (
  SELECT event_type, dow,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type, dow
),
totals AS (
  SELECT event_type,
         CAST(SUM(n_events) AS BIGINT) AS tot_events,
         CAST(SUM(n_days) AS BIGINT) AS tot_days
  FROM per_dow GROUP BY event_type
)
SELECT p.event_type, p.dow, p.n_events, p.n_days,
       (CAST(p.n_events AS DOUBLE) / p.n_days)
         / (CAST(t.tot_events AS DOUBLE) / t.tot_days) AS seasonal_index
FROM per_dow p JOIN totals t
  ON t.event_type IS NOT DISTINCT FROM p.event_type
""",
)
def q173_dow_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: (mean daily count on
    that weekday) / (overall mean daily count) — the multiplicative
    seasonal factor a forecast divides out and an anomaly alert
    multiplies in (q123's z-scores fire every Sunday without it; q170
    says WHETHER seasonality exists, this says HOW MUCH per day).
    Normalizing by days-observed, not event totals, keeps a
    short-history weekday from biasing its index.

    All counts integer; the index is a ratio of two integer ratios —
    one pinned double expression. Shape: corpus → (type, day) partial
    agg (the only corpus-sized exchange), a (type, dow) rollup, then
    per-type totals as windows over that 7·|types|-row aggregate
    (3 exchanges total, pinned).

    NULL event_type is ITS OWN series in both engines: the Spark
    window partition keeps it naturally, and the oracle's totals join
    is IS NOT DISTINCT FROM — a plain equi-join silently dropped the
    NULL-type rows only on the SQL side (hostile-input sweep). Same
    fix in q197, which composes these factors."""
    e = t(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint")
    daily = e.groupBy(
        "event_type", day.alias("day"), ((day + 3) % 7).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("c"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    # per-type totals as a window over the 7·|types|-row aggregate —
    # a separate totals agg + rejoin re-planned the whole daily subtree
    # per branch (measured 5 exchanges vs 3; all tiny, but the simpler
    # plan is also the honest one)
    wt = Window.partitionBy("event_type")
    return per_dow.select(
        "event_type",
        "dow",
        "n_events",
        "n_days",
        (
            (F.col("n_events").cast("double") / F.col("n_days"))
            / (
                F.sum("n_events").over(wt).cast("double")
                / F.sum("n_days").over(wt)
            )
        ).alias("seasonal_index"),
    )


@register(
    "q177_srm_check",
    tags=("events", "llm-data", "experimentation", "quality"),
    oracle="""
WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS arm
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM u
)
SELECT n_a, n_b,
       CAST(n_a + n_b AS BIGINT) AS n_total,
       CAST(n_a AS DOUBLE) / (n_a + n_b) AS share_a,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) AS chi2_srm,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) > 3.841e0
         AS srm_flag
FROM agg
""",
)
def q177_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for q140's experiment: chi-square of
    the arm sizes against the designed 50/50 split — for a two-cell
    uniform null the statistic reduces to (n_a−n_b)²/(n_a+n_b), pure
    integers until one divide. SRM is the first thing to check before
    believing ANY A/B readout (a logging bug that drops one arm's
    events biases every downstream metric); flag fires at the 3.84
    critical value (df=1, α=0.05). Same md5 arm assignment expression
    as q140 — the check audits the experiment it ships with.

    Shape: one user rollup exchange (map-side combined), then a 1-row
    reduction."""
    e = t(spark, sf_dir, "events")
    arm = _arm_col()
    u = e.select("user_id").distinct().select(arm.alias("arm"))
    agg = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    d2 = (
        ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b")))
        .cast("double")
        / (F.col("n_a") + F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "n_b",
        (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n_total"),
        (F.col("n_a").cast("double") / (F.col("n_a") + F.col("n_b"))).alias(
            "share_a"
        ),
        d2.alias("chi2_srm"),
        (d2 > F.lit(3.841)).alias("srm_flag"),
    )


# Import-time drift guard: the three experiment-family oracles must
# embed the canonical arm hash verbatim. A seed/slice change that
# misses one copy fails HERE, not silently in a meaningless SRM report.
for _q in ("q140_ab_test_conversion", "q149_funnel_by_arm", "q177_srm_check"):
    assert _SQL_ARM_HASH in QUERIES[_q].oracle, _q


@register(
    "q185_burstiness_fano",
    tags=("events", "timeseries", "stats"),
    oracle="""
WITH per_min AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, minute
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_minutes,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(MAX(c) AS BIGINT) AS max_per_minute,
       CASE WHEN SUM(c) > 0
            THEN (CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
                  / COUNT(*)) / CAST(SUM(c) AS DOUBLE)
            ELSE NULL END AS fano_factor
FROM per_min
GROUP BY event_type
""",
)
def q185_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness screen: the Fano factor (variance/mean) of per-minute
    event counts per type, over OBSERVED minutes. A Poisson-steady
    stream sits at 1; a bot burst or thundering herd pushes it far
    above — the number that says whether q123's rate alarms need
    burst-robust thresholds. Fano = (k·Σc² − (Σc)²)/k / Σc from exact
    BIGINT sufficient statistics (population variance; q164's
    discipline), zero-event types guarded to NULL identically in both
    engines.

    Shape: one (type, minute) partial agg over the corpus, then a
    |types|-row reduction. Observed-minute semantics documented (an
    all-idle minute contributes no row; the factor measures burstiness
    WITHIN active minutes)."""
    e = t(spark, sf_dir, "events")
    minute = F.floor(F.unix_micros("ts") / 60_000_000).cast("bigint")
    per_min = e.groupBy("event_type", minute.alias("minute")).agg(
        F.count(F.lit(1)).alias("c")
    )
    c = F.col("c")
    k = F.count(F.lit(1))
    sc = F.sum(c)
    scc = F.sum(c * c)
    return per_min.groupBy("event_type").agg(
        k.alias("n_minutes"),
        sc.cast("bigint").alias("n_events"),
        F.max(c).cast("bigint").alias("max_per_minute"),
        F.when(
            sc > 0,
            ((k * scc - sc * sc).cast("double") / k) / sc.cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("fano_factor"),
    )


@register(
    "q186_priority_mix_drift",
    tags=("events", "relational", "drift", "stats"),
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY month, o_orderpriority
),
tot AS (
  SELECT month, CAST(SUM(c) AS BIGINT) AS n_month FROM m GROUP BY month
),
pool AS (
  SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS c_pool,
         CAST(SUM(SUM(c)) OVER () AS BIGINT) AS n_pool
  FROM m GROUP BY o_orderpriority
)
SELECT m.month, t.n_month,
       CAST(SUM(CAST(FLOOR(
         (CAST(m.c AS DOUBLE)
            - CAST(t.n_month AS DOUBLE) * p.c_pool / p.n_pool)
         * (CAST(m.c AS DOUBLE)
            - CAST(t.n_month AS DOUBLE) * p.c_pool / p.n_pool)
         / (CAST(t.n_month AS DOUBLE) * p.c_pool / p.n_pool)
         * 1000000000000.0) AS BIGINT)) AS DOUBLE) / 1e12 AS chi2_vs_pooled
FROM m
JOIN tot t ON t.month = m.month
JOIN pool p ON p.o_orderpriority = m.o_orderpriority
GROUP BY m.month, t.n_month
""",
)
def q186_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix-shift monitor: each month's order-priority mix
    tested (chi-square) against the pooled all-time mix — q131's
    numeric drift screen for CATEGORICAL columns, the check that
    catches 'the upstream enum changed meaning in March' before a
    model trained on the pooled mix meets skewed serving traffic.

    Determinism: expected counts are the pinned expression n_month ·
    c_pool/n_pool of exact integers; the per-cell chi2 terms are
    identical IEEE doubles in both engines and reduce through the
    floor-quantized BIGINT ladder (qsum discipline) — even a 5-term
    double sum is order-dependent, so no raw double is ever SUMmed.

    Shape: one (month, priority) partial agg over orders, two tiny
    rollups broadcast back, |months|-row output."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = m.groupBy("month").agg(F.sum("c").cast("bigint").alias("n_month"))
    wall = Window.partitionBy()
    pool = (
        m.groupBy("o_orderpriority")
        .agg(F.sum("c").alias("c_pool"))
        .select(
            "o_orderpriority",
            F.col("c_pool").cast("bigint").alias("c_pool"),
            F.sum("c_pool").over(wall).cast("bigint").alias("n_pool"),
        )
    )
    exp = (
        F.col("n_month").cast("double")
        * F.col("c_pool")
        / F.col("n_pool")
    )
    dev = F.col("c").cast("double") - exp
    return (
        m.join(F.broadcast(tot), "month")
        .join(F.broadcast(pool), "o_orderpriority")
        .groupBy("month", "n_month")
        .agg(
            (qsum(dev * dev / exp).cast("double") / F.lit(1e12)).alias(
                "chi2_vs_pooled"
            )
        )
    )


@register(
    "q190_out_of_order_audit",
    tags=("events", "streaming", "quality", "watermark"),
    oracle="""
WITH seq AS (
  -- arrival order pinned NULLS FIRST on BOTH keys: a NULL event_id
  -- (and a NULL ts on the tie-break) orders first in Spark windows
  -- and last in DuckDB, and duplicate ids with different timestamps
  -- would make the running max order-dependent (events identity
  -- probe r7; NULL-ts pin r8 advice)
  SELECT event_type,
         epoch_us(ts) - MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id
           ORDER BY event_id ASC NULLS FIRST, ts ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS skew_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN skew_us < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       CAST(SUM(CASE WHEN skew_us < 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS ooo_rate,
       CAST(MIN(skew_us) AS BIGINT) AS max_backward_us
FROM seq
GROUP BY event_type
""",
)
def q190_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: per event type, how often a user's
    events arrive with an event-time EARLIER than that user's running
    maximum (arrival order = event_id), and the worst backward skew in
    microseconds. max_backward_us IS the lateness bound a streaming
    watermark must cover — q60/q62's '10 minutes' is a guess until
    this table says the p100 disorder; re-run per source before
    trusting a tighter delay. (A NULL max_backward_us would mean a
    perfectly ordered type; negative is the observed bound.)

    Integer microsecond arithmetic throughout (q47's discipline); the
    running max and the lag comparison share ONE user_id exchange
    (arrival order approximated by event_id — the generator's append
    order — since files carry no kafka offset); final agg is |types|
    rows."""
    e = t(spark, sf_dir, "events")
    # NULLS FIRST + ts tie-break pinned: see oracle comment
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("event_id").asc_nulls_first(),
            F.col("ts").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros("ts")
    seq = e.select(
        "event_type", (us - F.max(us).over(w)).alias("skew_us")
    )
    ooo = F.sum(F.when(F.col("skew_us") < 0, 1).otherwise(0))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        ooo.cast("bigint").alias("n_out_of_order"),
        (ooo.cast("double") / F.count(F.lit(1))).alias("ooo_rate"),
        F.min("skew_us").cast("bigint").alias("max_backward_us"),
    )


@register(
    "q191_asof_staleness",
    tags=("events", "asof", "feature-store", "histogram"),
    oracle="""
WITH matched AS (
  SELECT p.event_id,
         epoch_us(p.ts) - MAX(epoch_us(c.ts)) AS staleness_us
  FROM events p
  LEFT JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
  WHERE p.event_type = 'purchase'
  GROUP BY p.event_id, p.ts
)
SELECT CASE WHEN staleness_us IS NULL THEN -1
            ELSE CAST(LENGTH(bin(staleness_us // 1000000 + 1)) - 1 AS INT)
       END AS log2_staleness_s,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(MIN(staleness_us) AS BIGINT) AS min_staleness_us,
       CAST(MAX(staleness_us) AS BIGINT) AS max_staleness_us
FROM matched
GROUP BY log2_staleness_s
""",
)
def q191_asof_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-staleness histogram for the as-of join: how old the
    matched last-click feature is at each purchase (the point-in-time
    correctness metric a feature store reports — a feature that is
    usually 6 hours stale trains a model the online store can't
    reproduce). Bucket −1 collects purchases with NO prior click (the
    null-feature rate); others are floor(log2(seconds+1)) buckets of
    purchase_ts − last_click_ts, the same dataflow q61 hash-checks.

    Integer microsecond arithmetic; +1 inside the log keeps the
    0-second co-instant match in a defined bucket. Shape: the as-of
    resolves on ONE user_id exchange (q61's operator discipline —
    the oracle states the quadratic spec), then a ~40-key histogram
    agg."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("ts").alias("click_ts")
    )
    matched = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        right_payload=["click_ts"],
    )
    staleness = F.unix_micros("ts") - F.unix_micros("asof_click_ts")
    bucket = F.when(F.col("asof_click_ts").isNull(), F.lit(-1)).otherwise(
        (
            F.length(
                F.bin((staleness / 1_000_000).cast("bigint") + 1)
            )
            - 1
        ).cast("int")
    )
    return (
        matched.select(
            bucket.alias("log2_staleness_s"), staleness.alias("staleness_us")
        )
        .groupBy("log2_staleness_s")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.min("staleness_us").cast("bigint").alias("min_staleness_us"),
            F.max("staleness_us").cast("bigint").alias("max_staleness_us"),
        )
    )


@register(
    "q195_linear_attribution",
    tags=("events", "attribution", "range-join"),
    oracle=f"""
WITH touches AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         CAST((epoch_us(c.ts) // 3600000000) % 24 AS INT) AS click_hour
  FROM events p
  JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
   AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL '7 days'
  WHERE p.event_type = 'purchase'
),
per_purchase AS (
  SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_touches
  FROM touches GROUP BY purchase_id
)
SELECT t.click_hour,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST({{q}} AS DOUBLE) / 1e12 AS credited_conversions
FROM touches t
JOIN per_purchase p ON p.purchase_id = t.purchase_id
GROUP BY t.click_hour
""".format(q="SUM(CAST(FLOOR(1e0 / p.n_touches * 1000000000000.0) AS BIGINT))"),
)
def q195_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 7 days
    before a purchase shares the conversion equally (credit = 1/n
    touches), aggregated by click hour-of-day — the marketing-channel
    credit table that last-touch (q61) systematically biases toward
    late-night closers. Credits are identical per-row doubles (1/n of
    an exact count) reduced through the qsum ladder; each purchase's
    credit sums to exactly 1 before quantization (pinned in
    test_catalog).

    Shape: the touch relation is the q46 range join (user-keyed
    equi-join, time predicate as post-filter); per-purchase counts are
    one agg on it; the credit join keys on purchase_id — all three
    relations shrink monotonically. Hour is integer epoch arithmetic
    (UTC)."""
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    us_c = F.unix_micros("c_ts")
    us_p = F.unix_micros("p_ts")
    touches = p.join(c, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (us_c > us_p - 7 * 86_400_000_000)
    ).select(
        "purchase_id",
        "click_id",
        ((F.floor(us_c / 3_600_000_000)) % 24).cast("int").alias("click_hour"),
    )
    per_purchase = touches.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    credited = touches.join(per_purchase, "purchase_id")
    credit_q = F.floor(
        F.lit(1.0) / F.col("n_touches") * F.lit(1e12)
    ).cast("bigint")
    return credited.groupBy("click_hour").agg(
        F.count(F.lit(1)).alias("n_touches"),
        (F.sum(credit_q).cast("double") / F.lit(1e12)).alias(
            "credited_conversions"
        ),
    )


@register(
    "q197_deseasonalized_anomalies",
    tags=("events", "timeseries", "anomaly", "composition"),
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS INT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY event_type, day, dow
),
dow_tot AS (
  SELECT event_type, dow,
         CAST(SUM(c) AS BIGINT) AS s_dow,
         CAST(COUNT(*) AS BIGINT) AS d_dow
  FROM daily GROUP BY event_type, dow
),
adj AS (
  SELECT d.event_type, d.day, d.c,
         CAST(d.c AS DOUBLE) * d2.d_dow / d2.s_dow AS adj_c
  FROM daily d JOIN dow_tot d2
    ON d2.event_type IS NOT DISTINCT FROM d.event_type AND d2.dow = d.dow
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(FLOOR(adj_c * 1000000.0) AS BIGINT)) AS q1,
         SUM(CAST(FLOOR(adj_c * adj_c * 1000000.0) AS BIGINT)) AS q2
  FROM adj GROUP BY event_type
)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN m.k >= 2
              AND (CAST(m.k AS DOUBLE) * (CAST(m.q2 AS DOUBLE) / 1e6)
                   - (CAST(m.q1 AS DOUBLE) / 1e6)
                     * (CAST(m.q1 AS DOUBLE) / 1e6)) > 0e0
              AND ABS(a.adj_c - (CAST(m.q1 AS DOUBLE) / 1e6) / m.k)
                  > 3e0 * sqrt(CAST(m.k AS DOUBLE)
                                  * (CAST(m.q2 AS DOUBLE) / 1e6)
                                - (CAST(m.q1 AS DOUBLE) / 1e6)
                                  * (CAST(m.q1 AS DOUBLE) / 1e6)) / m.k
            THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_days
FROM adj a JOIN mom m ON m.event_type IS NOT DISTINCT FROM a.event_type
GROUP BY a.event_type
""",
)
def q197_deseasonalized_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally adjusted anomaly count: daily counts are divided by
    their weekday's seasonal index (q173's factors, inlined) BEFORE
    the 3σ test — the composition that stops q123-style alarms firing
    every Sunday: seasonality is explained variance, not anomaly.

    Determinism: the adjusted series is per-row IEEE on integer
    ratios; its moments pass through the floor-quantized BIGINT
    ladder at 1e6. Overflow dial: a SINGLE floor(adj_c²·1e6) term
    hits 2^63 at adj_c ≈ 3.0e6, and q2 sums n_days of them, so the
    safe bound is adj_c ≤ sqrt(2^63 / (1e6 · n_days)) — ~1e6 for a
    multi-year daily series. Past it the failure mode is silent
    divergence, not an error: Spark's non-ANSI BIGINT sum wraps
    while DuckDB's SUM promotes to HUGEINT, so parity AND the
    statistic both break. For corpora above the bound, drop the
    quantization scale (1e6 → 1e3) or pre-scale adj_c. The 3σ
    comparison is a pinned expression of those exact sums. Degenerate
    series (k<2 or zero variance) contribute no anomalies identically
    in both engines.

    Shape: one (type, day) corpus exchange, then joins/aggregates on
    day-level relations only."""
    e = te(spark, sf_dir)
    day = F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint")
    daily = e.groupBy(
        "event_type", day.alias("day"), ((day + 3) % 7).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("c"))
    # everything below is WINDOWS over the one daily relation — the
    # join formulation (dow rollup + moment rollup + two re-joins)
    # re-planned the corpus aggregate once per branch (8 static
    # exchanges, ~4 corpus scans); chained windows keep ONE corpus
    # exchange and shuffle only the day-level relation after it
    wdow = Window.partitionBy("event_type", "dow")
    adj = daily.select(
        "event_type",
        "day",
        (
            F.col("c").cast("double")
            * F.count(F.lit(1)).over(wdow)
            / F.sum("c").over(wdow)
        ).alias("adj_c"),
    )
    wt = Window.partitionBy("event_type")
    k = F.count(F.lit(1)).over(wt)
    s1 = (
        F.sum(F.floor(F.col("adj_c") * F.lit(1e6)).cast("bigint")).over(wt)
    ).cast("double") / F.lit(1e6)
    s2 = (
        F.sum(
            F.floor(F.col("adj_c") * F.col("adj_c") * F.lit(1e6)).cast("bigint")
        ).over(wt)
    ).cast("double") / F.lit(1e6)
    # SS = k·Σx² − (Σx)² = k²·var — the subtraction form with NO inner
    # divide (an earlier draft divided s1² by k inside SS: both engines
    # agreed, parity stayed green, and the statistic was silently not
    # σ — the drift-with-parity trap; caught by re-deriving, kept as a
    # warning)
    ss = k.cast("double") * s2 - s1 * s1
    mean = s1 / k
    std = F.sqrt(ss) / k
    flag = F.when(
        (k >= 2) & (ss > 0.0) & (F.abs(F.col("adj_c") - mean) > F.lit(3.0) * std),
        1,
    ).otherwise(0)
    return (
        adj.select("event_type", flag.alias("flag"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("flag").cast("bigint").alias("n_anomalous_days"),
        )
    )


# ---- q205: per-type OLS daily trend --------------------------------------

# Daily totals are scale-6 floor-quantized BIGINTs (value < 500, ~300
# rows/day even at sf1 keeps the per-day sum < 2^53 pre-floor), and the
# regression runs entirely in exact 64-bit integer sums: with x = day
# index (< ~40) and y < 5e11, n*Sxy < 30*40*5e11*30 ~ 2e16 << 2^63.
# Only the final two divisions touch doubles (BIGINT/BIGINT -> the same
# IEEE op in both engines).
# r9 scale audit: q205/q233 deliberately KEEP int64 qsum (unlike
# q100/q230's qsum_big migration) because their downstream power-sum
# arithmetic and wire columns (sy/sxy; x2-x1 slopes) are int64 by
# contract — the documented horizon is ~9.2e9 mean-magnitude value
# rows per (type, day) at scale 6, and the wire format caps the
# design scale before the accumulator does (SCALING.md, Aggregations).


@register(
    "q205_ols_trend",
    tags=("events", "regression", "agg", "window"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS y_q
  FROM events
  GROUP BY event_type, day
),
xy AS (
  SELECT event_type, y_q,
         CAST(date_diff('day', MIN(day) OVER (PARTITION BY event_type), day)
              AS BIGINT) AS x
  FROM daily
),
s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y_q) AS sy,
         SUM(x * x) AS sxx, SUM(x * y_q) AS sxy
  FROM xy GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, sx, sy, sxx, sxy,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE))
                 * 1e-6 END AS slope_per_day,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE ((sy * sxx - sx * sxy) / CAST(n * sxx - sx * sx AS DOUBLE))
                 * 1e-6 END AS intercept
FROM s
""",
)
def q205_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS regression of daily event value against time, per
    event type — the trend-line primitive behind drift monitors and
    capacity forecasts. slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) computed
    from exact integer power sums (quantized y, per-type day index), so
    the whole regression is engine-exact up to the final division.

    Shape: daily partial agg (map-side combine on ~type×days keys), a
    per-type window MIN for the day origin, then a second tiny agg for
    the power sums — the distributed-regression pattern where only
    5 numbers per group cross the wire, never the observations. The
    same sums merge associatively across 1000 executors at 100 TB."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(qsum(F.col("value"), 6).alias("y_q"))
    w = Window.partitionBy("event_type")
    xy = daily.select(
        "event_type",
        "y_q",
        F.datediff(F.col("day"), F.min("day").over(w)).cast("bigint").alias("x"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y_q")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    det_i = n * sxx - sx * sx
    det = det_i.cast("double")
    # det = 0 (all observations on one day) -> NULL, not a crash: ANSI
    # Spark raises DIVIDE_BY_ZERO where DuckDB yields NULL — the
    # zero-denominator rule (same guard as the trend query's)
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        "sx", "sy", "sxx", "sxy",
        F.when(det_i != 0, ((n * sxy - sx * sy) / det) * F.lit(1e-6))
        .alias("slope_per_day"),
        F.when(det_i != 0, ((sy * sxx - sx * sxy) / det) * F.lit(1e-6))
        .alias("intercept"),
    )


# ---- q209: peak interval concurrency (sweep line) ------------------------

_CONC_DUR_US = 300 * 1_000_000  # each event holds a 5-minute interval


@register(
    "q209_interval_concurrency",
    tags=("events", "sweep-line", "window", "agg"),
    oracle=f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {_CONC_DUR_US} AS t, -1 AS delta
  FROM events
),
net AS (
  SELECT event_type, t, SUM(delta) AS net
  FROM b GROUP BY event_type, t
),
run AS (
  SELECT event_type, t,
         SUM(net) OVER (PARTITION BY event_type ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM net
)
SELECT event_type,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(MIN(CASE WHEN conc = m THEN t END) AS BIGINT) AS peak_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries
FROM (SELECT *, MAX(conc) OVER (PARTITION BY event_type) AS m FROM run) r
GROUP BY event_type
""",
)
def q209_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval-overlap concurrency per event type via the sweep
    line: every event holds a half-open 5-minute interval; boundaries
    become +1/−1 deltas, deltas collapse per distinct timestamp (ends
    and starts at the same instant net out — the half-open convention
    needs no tie ordering once netted), and a running sum over time is
    the concurrency curve. Reported: the curve's max and the earliest
    time it is reached.

    Shape: one union-explode (narrow), one partial agg on (type, t),
    one window partitioned by type — at 100 TB the curve per type is
    the only ordered pass, and it partitions by the group key, not
    time, so no global sort. Integer microseconds end to end."""
    e = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    starts = e.select(
        "event_type", us.alias("t"), F.lit(1).alias("delta")
    )
    ends = e.select(
        "event_type",
        (us + F.lit(_CONC_DUR_US)).alias("t"),
        F.lit(-1).alias("delta"),
    )
    net = (
        starts.unionByName(ends)
        .groupBy("event_type", "t")
        .agg(F.sum("delta").alias("net"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.select(
        "event_type", "t", F.sum("net").over(w).alias("conc")
    )
    wm = Window.partitionBy("event_type")
    flagged = run.select(
        "event_type", "t", "conc", F.max("conc").over(wm).alias("m")
    )
    return flagged.groupBy("event_type").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.min(F.when(F.col("conc") == F.col("m"), F.col("t")))
        .cast("bigint")
        .alias("peak_start_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
    )


# ---- q213: linear-interpolation resample ---------------------------------


@register(
    "q213_linear_interpolation",
    tags=("events", "time-series", "resample", "interpolation"),
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS v_q
  FROM events GROUP BY event_type, hr
),
bounds AS (
  SELECT event_type,
         date_trunc('hour', MIN(ts)) AS hr_min,
         date_trunc('hour', MAX(ts)) AS hr_max
  FROM events GROUP BY event_type
),
spine AS (
  SELECT b.event_type, unnest(generate_series(b.hr_min, b.hr_max,
                                              INTERVAL 1 HOUR)) AS hr
  FROM bounds b
),
j AS (
  SELECT s.event_type, s.hr,
         epoch_us(s.hr) // 3600000000 AS hn,
         h.n_events, h.v_q
  FROM spine s LEFT JOIN hourly h
    ON h.event_type = s.event_type AND h.hr = s.hr
),
nb AS (
  SELECT event_type, hr, hn, n_events, v_q,
         last_value(v_q IGNORE NULLS) OVER w_prev AS v0,
         last_value(CASE WHEN v_q IS NOT NULL THEN hn END IGNORE NULLS)
           OVER w_prev AS t0,
         first_value(v_q IGNORE NULLS) OVER w_next AS v1,
         first_value(CASE WHEN v_q IS NOT NULL THEN hn END IGNORE NULLS)
           OVER w_next AS t1
  FROM j
  WINDOW w_prev AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hr AS hour_start,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CAST(v_q IS NOT NULL AS INT) AS observed,
       -- HUGEINT -> DOUBLE routes through VARCHAR: DuckDB's direct cast
       -- is not correctly rounded above 2^64 (r10, sql_big_to_double)
       CASE WHEN v_q IS NOT NULL
            THEN CAST(CAST(v_q AS VARCHAR) AS DOUBLE) * 1e-6
            ELSE (CAST(CAST(v0 * (t1 - hn) + v1 * (hn - t0) AS VARCHAR)
                       AS DOUBLE)
                  / CAST(t1 - t0 AS DOUBLE)) * 1e-6
       END AS value_interp
FROM nb
""",
)
def q213_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resample (q100's forward-fill twin, the
    other standard gap-fill mode): dense hourly spine per event type;
    observed hours carry their exact hourly total; missing hours get
    the line between the bracketing observations —
    v = (v0·(t1−h) + v1·(h−t0)) / (t1−t0).

    Engine-exact by construction: hourly totals are scale-6 quantized
    BIGINTs, hour indices are integer epoch-hours, so the interpolation
    numerator/denominator are exact int64 products (|v_q|·span < 2^53
    at any plausible gap) and the single BIGINT/BIGINT division is the
    same IEEE op in both engines. Spine rows before the first / after
    the last observation cannot occur (bounds are observed hours), so
    t0/t1 always exist for interior gaps and den > 0 exactly on the
    non-observed rows. Shape: hourly pre-agg before the spine join,
    then ONE partition-ordered pass per type computing both bracketing
    windows — the sort is per event_type, never global."""
    e = t(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        # qsum_big: rows per (type, hour) grows with the corpus — the
        # int64 form wraps past ~9.2e9 mean-magnitude rows/group (r9
        # scale audit, SCALING.md); the decimal merge is exact and the
        # wire value (one double rounding at the end) is unchanged
        qsum_big(F.col("value"), 6).alias("v_q"),
    )
    bounds = e.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("hr_min"),
        F.date_trunc("hour", F.max("ts")).alias("hr_max"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("hr_min", "hr_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    j = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.expr("unix_micros(hr) div 3600000000").alias("hn"),
        "n_events",
        "v_q",
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_of = F.when(F.col("v_q").isNotNull(), F.col("hn"))
    nb = j.select(
        "event_type",
        "hr",
        "hn",
        "n_events",
        "v_q",
        F.last("v_q", ignorenulls=True).over(w_prev).alias("v0"),
        F.last(t_of, ignorenulls=True).over(w_prev).alias("t0"),
        F.first("v_q", ignorenulls=True).over(w_next).alias("v1"),
        F.first(t_of, ignorenulls=True).over(w_next).alias("t1"),
    )
    interp = (
        (F.col("v0") * (F.col("t1") - F.col("hn"))
         + F.col("v1") * (F.col("hn") - F.col("t0")))
        / (F.col("t1") - F.col("t0")).cast("double")
    ) * F.lit(1e-6)
    return nb.select(
        "event_type",
        F.col("hr").alias("hour_start"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.col("v_q").isNotNull().cast("int").alias("observed"),
        F.when(F.col("v_q").isNotNull(), F.col("v_q") * F.lit(1e-6))
        .otherwise(interp)
        .alias("value_interp"),
    )


# ---- q223: next-event predictability (Gini impurity) ---------------------

# Quantizer for transition probabilities: p_q = (Q*c) div n <= Q = 1e6, so
# p_q^2 <= 1e12 and the impurity sum stays far inside BIGINT at any row
# count — the quantization (not the counts) bounds the arithmetic, which
# is what makes this safe at 100 TB where c^2 alone would overflow int64.
_GINI_Q = 1_000_000


@register(
    "q223_transition_gini",
    tags=("events", "markov", "quality", "agg"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
),
cnt AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
tot AS (
  SELECT prev_type, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_next_types
  FROM cnt GROUP BY prev_type
)
SELECT c.prev_type,
       CAST(MIN(t.n) AS BIGINT) AS n_transitions,
       CAST(MIN(t.n_next_types) AS BIGINT) AS n_next_types,
       CAST({_GINI_Q} - SUM((({_GINI_Q} * c.c) // t.n)
                            * (({_GINI_Q} * c.c) // t.n)) // {_GINI_Q}
            AS BIGINT) AS gini_q
FROM cnt c JOIN tot t ON t.prev_type = c.prev_type
GROUP BY c.prev_type
""",
)
def q223_transition_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event predictability per antecedent event type: Gini
    impurity 1 - Σp² of the next-event distribution (q116's transition
    matrix collapsed to one decisiveness scalar per row) — low impurity
    means the journey step is deterministic (funnel edge), high means
    an exploration point. Gini, not Shannon entropy, because it is
    LOGARITHM-FREE: quantized probabilities square and sum in exact
    BIGINT arithmetic, engine-identical (the q93/q217 lesson applied
    to information measures).

    Shape: q116's one user window + (prev,next) agg; totals are a
    rollup of the transition counts (never a second pass over events);
    the impurity agg runs on the |event types|² matrix — dimension-
    sized, trivially small at any corpus scale."""
    e = te(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy("prev_type").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_next_types")
    )
    p_q = F.expr(f"({_GINI_Q} * c) div n")
    return (
        cnt.join(tot, "prev_type")
        .groupBy("prev_type")
        .agg(
            F.min("n").cast("bigint").alias("n_transitions"),
            F.min("n_next_types").cast("bigint").alias("n_next_types"),
            F.expr(
                f"CAST({_GINI_Q} - SUM((({_GINI_Q} * c) div n)"
                f" * (({_GINI_Q} * c) div n)) div {_GINI_Q} AS BIGINT)"
            ).alias("gini_q"),
        )
    )


# --------------------------------------------------------------------------
# q229 — Kaplan-Meier risk table (survival analysis over user lifetimes)
# --------------------------------------------------------------------------

_KM_HORIZON_DAYS = 7   # "churned" = silent for the last week of the corpus
_KM_Q = 1_000_000      # hazard quantizer


@register(
    "q229_kaplan_meier_table",
    tags=("events", "survival", "window", "analytics"),
    oracle=f"""
WITH base AS (
  SELECT user_id, ts FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
mx AS (SELECT MAX(ts) AS max_ts FROM base),
pu AS (
  SELECT user_id,
         CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
              AS INT) AS duration_days,
         CASE WHEN MAX(ts) < (SELECT max_ts FROM mx)
                              - INTERVAL {_KM_HORIZON_DAYS} DAY
              THEN 1 ELSE 0 END AS death
  FROM base GROUP BY user_id
),
lvl AS (
  SELECT duration_days,
         CAST(SUM(death) AS BIGINT) AS n_deaths,
         CAST(SUM(1 - death) AS BIGINT) AS n_censored
  FROM pu GROUP BY duration_days
),
risk AS (
  SELECT duration_days, n_deaths, n_censored,
         SUM(n_deaths + n_censored) OVER (
           ORDER BY duration_days DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM lvl
)
SELECT duration_days, CAST(n_risk AS BIGINT) AS n_risk, n_deaths, n_censored,
       CAST(({_KM_Q} * n_deaths) // n_risk AS BIGINT) AS hazard_q
FROM risk
""",
)
def q229_kaplan_meier_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table over user lifetimes — the survival-
    analysis primitive behind churn/retention curves. A user's
    lifetime is first-event to last-event (whole days); users whose
    last event falls within {_KM_HORIZON_DAYS} days of the corpus
    horizon are right-CENSORED (still alive at observation end),
    everyone else is a churn event at their lifetime. Per observed
    lifetime t: deaths d_t, censored c_t, and the at-risk count
    n_t = Σ_(t'>=t)(d+c) via a descending cumulative window. The
    per-step hazard is the integer-quantized rational
    ({_KM_Q}·d_t) div n_t — the survival curve Π(1 - hazard) is a
    |steps|-row presentation fold, deliberately NOT computed here
    (cumulative FP products are neither order-stable nor
    cross-engine exact; the table is the distributed part).

    Shape at scale: one user-key agg (the only data-sized shuffle),
    a horizon scalar broadcast, then a duration-level relation bounded
    by the corpus time span in DAYS (thousands of rows at any data
    scale) — its unpartitioned ordered window is bounded by the
    calendar, not the data."""
    base = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", "ts")
    mx = base.agg(F.max("ts").alias("max_ts"))
    pu = (
        base.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff(
                F.col("last_ts").cast("date"), F.col("first_ts").cast("date")
            ).cast("int").alias("duration_days"),
            F.when(
                F.col("last_ts")
                < F.col("max_ts") - F.expr(f"INTERVAL {_KM_HORIZON_DAYS} DAYS"),
                1,
            ).otherwise(0).alias("death"),
        )
    )
    lvl = pu.groupBy("duration_days").agg(
        F.sum("death").cast("bigint").alias("n_deaths"),
        F.sum(F.lit(1) - F.col("death")).cast("bigint").alias("n_censored"),
    )
    wdesc = (
        Window.orderBy(F.col("duration_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = lvl.withColumn(
        "n_risk",
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(wdesc),
    )
    return risk.select(
        "duration_days",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "n_deaths",
        "n_censored",
        F.expr(f"CAST(({_KM_Q} * n_deaths) div n_risk AS BIGINT)").alias(
            "hazard_q"
        ),
    )


# --------------------------------------------------------------------------
# q230 — CUSUM changepoint detection on daily event-value series
# --------------------------------------------------------------------------


@register(
    "q230_cusum_changepoint",
    tags=("events", "timeseries", "changepoint", "window"),
    oracle=f"""
WITH base AS (
  SELECT event_type, ts, value FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_qsum('value', 6)} AS dq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(dq) AS total_q, SUM(n) AS total_n
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day,
         d.dq * t.total_n - t.total_q * d.n AS dev
  FROM daily d JOIN tot t ON d.event_type IS NOT DISTINCT FROM t.event_type
),
cus AS (
  SELECT event_type, day,
         SUM(dev) OVER (PARTITION BY event_type ORDER BY day ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cusum,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM dev
),
ranked AS (
  SELECT event_type, day, cusum, n_days,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(cusum) DESC, day ASC) AS rn
  FROM cus
)
SELECT event_type, day AS change_day, CAST(cusum AS BIGINT) AS cusum_at_change,
       CAST(n_days AS BIGINT) AS n_days
FROM ranked WHERE rn = 1
""",
)
def q230_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: where did the daily
    value level shift? The cumulative sum of deviations from the
    type's overall mean peaks (in absolute value) at the most likely
    changepoint — the classic Page/pettitt-style screen that q123's
    per-hour z-scores can't see (a persistent small shift never trips
    a pointwise threshold; it accumulates here).

    Engine-exactness: the deviation is the cross-multiplied integer
    form dq·N − total·n (daily quantized value sum dq, day count n,
    per-type totals) — no division anywhere, and Σdev telescopes to
    exactly 0, so the CUSUM is a true discrete bridge. All arithmetic
    is int64 under ANSI mode (loud overflow, never silent wrap);
    the 100 TB swap is DECIMAL(38,0) for the two products.

    Shape at scale: one (type, day) partial agg — calendar-bounded
    output — then a type-level broadcastable totals join, a window
    along each type's day series, and a 1-row-per-type argmax. The
    data-sized scan aggregates map-side; everything after is
    calendar-sized."""
    base = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select("event_type", "ts", "value")
    daily = base.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        # qsum_big: per-(type, day) cardinality is corpus-sized (r9
        # scale audit) — and the second-level F.sum("dq") + the
        # dev/cusum products inherit the exact decimal type, mirroring
        # the oracle's HUGEINT chain
        qsum_big(F.col("value"), 6).alias("dq"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("dq").alias("total_q"), F.sum("n").alias("total_n")
    )
    dev = daily.join(
        tot.withColumnRenamed("event_type", "et"),
        F.col("event_type").eqNullSafe(F.col("et")),
    ).select(
        "event_type",
        "day",
        (
            F.col("dq") * F.col("total_n") - F.col("total_q") * F.col("n")
        ).alias("dev"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtype = Window.partitionBy("event_type")
    cus = dev.select(
        "event_type",
        "day",
        F.sum("dev").over(wcum).alias("cusum"),
        F.count(F.lit(1)).over(wtype).alias("n_days"),
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day").asc()
    )
    return (
        cus.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("cusum").cast("bigint").alias("cusum_at_change"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


# --------------------------------------------------------------------------
# q233 — Theil-Sen robust trend per event type
# --------------------------------------------------------------------------

_TS_EPOCH = "2024-01-01"
_TS_Q = 1_000_000


@register(
    "q233_theil_sen_trend",
    tags=("events", "timeseries", "robust-stats", "window"),
    oracle=f"""
WITH base AS (
  SELECT event_type, ts, value FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
),
daily AS (
  SELECT event_type,
         date_diff('day', DATE '{_TS_EPOCH}', CAST(ts AS DATE)) AS d,
         {sql_qsum('value', 2)} AS x
  FROM base GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(b.x - a.x AS DOUBLE) / (b.d - a.d) AS slope,
         a.d AS d1, b.d AS d2
  FROM daily a JOIN daily b
    ON a.event_type IS NOT DISTINCT FROM b.event_type AND a.d < b.d
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope ASC, d1 ASC, d2 ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
)
SELECT event_type,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(FLOOR(slope * {_TS_Q}) AS BIGINT) AS median_slope_q
FROM ranked WHERE rn = (n_pairs + 1) // 2
""",
)
def q233_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the (lower) MEDIAN of all
    pairwise slopes of the daily-value series — the estimator that
    shrugs off the outlier days that wreck q205's OLS fit (breakdown
    point 29% vs 0%).

    Engine-exactness: each slope is ONE IEEE division of exact
    integers ((x2-x1) quantized daily sums over (d2-d1) epoch days) —
    correctly rounded, so bit-identical in both engines; the median is
    selected by ORDER (never averaged), with (d1, d2) as the
    deterministic tie-break, and only quantized at the very end.

    Scale shape: the pairwise self-join is CALENDAR-bounded, not
    data-bounded — a 30-day series yields 435 pairs per type, a
    10-year one ~6.7M total, constant in corpus size; the data-sized
    scan collapses to (type, day) partials map-side first."""
    base = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select("event_type", "ts", "value")
    daily = base.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit(_TS_EPOCH).cast("date")
        ).alias("d"),
    ).agg(qsum(F.col("value"), 2).alias("x"))
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("d").alias("d1"),
        F.col("x").alias("x1"),
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("x").alias("x2"),
    )
    pairs = a.join(
        b, F.col("et").eqNullSafe(F.col("et2")) & (F.col("d1") < F.col("d2"))
    ).select(
        F.col("et").alias("event_type"),
        (
            (F.col("x2") - F.col("x1")).cast("double")
            / (F.col("d2") - F.col("d1"))
        ).alias("slope"),
        "d1",
        "d2",
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("d1").asc(), F.col("d2").asc()
    )
    wt = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.floor(F.col("slope") * _TS_Q).cast("bigint").alias(
            "median_slope_q"
        ),
    )


# --------------------------------------------------------------------------
# q234 — Mann-Whitney rank-sum (histogram-ranked, scale form)
# --------------------------------------------------------------------------

_MW_A, _MW_B = "click", "purchase"


@register(
    "q234_mann_whitney_u",
    tags=("events", "stats", "hypothesis-test", "window"),
    oracle=f"""
WITH base AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND event_type IN ('{_MW_A}', '{_MW_B}')
),
hist AS (
  SELECT value,
         CAST(SUM(CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN event_type = '{_MW_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b
  FROM base GROUP BY value
),
cum AS (
  SELECT value, n_a, n_b,
         COALESCE(SUM(n_a + n_b) OVER (
           ORDER BY value ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM hist
)
SELECT CAST(SUM(n_a) AS BIGINT) AS n1,
       CAST(SUM(n_b) AS BIGINT) AS n2,
       -- doubled midrank sum of group A keeps tied ranks integral:
       -- midrank*2 = 2*below + (n_a + n_b) + 1 per distinct value
       CAST(SUM(n_a * (2*below + n_a + n_b + 1)) AS BIGINT) AS r1_2x,
       CAST(SUM(n_a * (2*below + n_a + n_b + 1))
            - SUM(n_a) * (SUM(n_a) + 1) AS BIGINT) AS u1_2x,
       CAST(SUM(CASE WHEN n_a + n_b > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tied_values
FROM cum
""",
)
def q234_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum statistic comparing the '{_MW_A}' and
    '{_MW_B}' value distributions — the nonparametric A/B test that
    q140's conversion counts can't express (it compares whole
    distributions, not one rate). Everything stays integral: tied
    ranks use DOUBLED midranks (2·midrank = 2·below + tie_size + 1),
    so U·2 is exact int64 and no 0.5 ever touches a float.

    Scale shape (the part that matters): ranks are NOT computed by a
    global row sort — the plan aggregates to a VALUE HISTOGRAM first
    (one map-side-combinable shuffle, output bounded by distinct
    values), then one ordered window over the histogram yields every
    midrank. The classic rank()-over-all-rows form is a single-
    partition sort of the corpus; this is the same statistic at
    histogram cost."""
    base = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin(_MW_A, _MW_B)
    ).select("event_type", "value")
    hist = base.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == _MW_A, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("event_type") == _MW_B, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    wbelow = Window.orderBy(F.col("value").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "n_a",
        "n_b",
        F.coalesce(
            F.sum(F.col("n_a") + F.col("n_b")).over(wbelow), F.lit(0)
        ).alias("below"),
    )
    r1_2x = F.sum(
        F.col("n_a") * (2 * F.col("below") + F.col("n_a") + F.col("n_b") + 1)
    )
    n1 = F.sum("n_a")
    return cum.agg(
        n1.cast("bigint").alias("n1"),
        F.sum("n_b").cast("bigint").alias("n2"),
        r1_2x.cast("bigint").alias("r1_2x"),
        (r1_2x - n1 * (n1 + 1)).cast("bigint").alias("u1_2x"),
        F.sum(
            F.when(F.col("n_a") + F.col("n_b") > 1, 1).otherwise(0)
        ).cast("bigint").alias("n_tied_values"),
    )


# --------------------------------------------------------------------------
# q241 — seasonal-naive forecast backtest (per-type MAE)
# --------------------------------------------------------------------------


@register(
    "q241_seasonal_naive_backtest",
    tags=("events", "timeseries", "forecast", "eval", "window"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, n,
         LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day ASC) AS pred
  FROM daily
)
SELECT event_type,
       CAST(COUNT(pred) AS BIGINT) AS n_scored_days,
       CAST(SUM(ABS(n - pred)) AS BIGINT) AS abs_err_total,
       CAST(SUM(n) FILTER (WHERE pred IS NOT NULL) AS BIGINT)
         AS actual_total,
       CAST(MAX(ABS(n - pred)) AS BIGINT) AS worst_abs_err
FROM lagged
GROUP BY event_type
""",
)
def q241_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the SEASONAL-NAIVE forecaster (predict today's
    event count with the same weekday last week) — the baseline every
    anomaly threshold and capacity forecast must beat before anything
    fancier ships. Per type: scored days, total/worst absolute error,
    and the actual volume over the scored window (MAE and WAPE are
    one division for the reader; the table stays integer-exact).

    Day-7 lag rides LAG(7) over the observed day series — a MISSING
    day yields no prediction for the day 7 rows later (strict
    same-weekday semantics would need q100's spine; the observed-row
    form is the pinned contract here, identical in both engines).

    Shape: one calendar-bounded (type, day) partial agg, one lag
    window along each type's series, one type-level rollup."""
    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    lagged = daily.withColumn("pred", F.lag("n", 7).over(w))
    err = F.abs(F.col("n") - F.col("pred"))
    return lagged.groupBy("event_type").agg(
        F.count("pred").cast("bigint").alias("n_scored_days"),
        F.sum(err).cast("bigint").alias("abs_err_total"),
        F.sum(F.when(F.col("pred").isNotNull(), F.col("n")))
        .cast("bigint").alias("actual_total"),
        F.max(err).cast("bigint").alias("worst_abs_err"),
    )


# --------------------------------------------------------------------------
# q251 — semi-structured props triage via the VARIANT type
# --------------------------------------------------------------------------


@register(
    "q251_props_variant_triage",
    tags=("events", "json", "variant", "ingestion"),
    oracle="""
WITH cls AS (
  SELECT event_type,
         CASE WHEN props IS NULL THEN 'absent'
              WHEN NOT json_valid(props) THEN 'malformed'
              WHEN json_type(props::JSON, '$.k') IN ('UBIGINT', 'BIGINT')
                THEN 'int_k'
              WHEN json_extract_string(props::JSON, '$.k') IS NOT NULL
                THEN 'nonint_k'
              ELSE 'no_usable_k' END AS klass,
         CASE WHEN props IS NOT NULL AND json_valid(props)
                   AND json_type(props::JSON, '$.k') IN ('UBIGINT', 'BIGINT')
              THEN CAST(json_extract_string(props::JSON, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type, klass,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM cls
GROUP BY event_type, klass
""",
)
def q251_props_variant_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured INGESTION TRIAGE through Spark's VARIANT type
    (the 4.x semi-structured path): props parse ONCE via
    try_parse_json (malformed → NULL variant, never an error), then
    every row lands in exactly one class — absent / malformed /
    integer-k / non-integer-k / parsed-but-no-usable-k — with the
    integer payload summed. The class census is what an ingestion
    pipeline alerts on (a schema change shows up as mass migrating
    between classes), and VARIANT keeps the parse cost single-pass
    where repeated get_json_object calls (q63's pre-4.x form) re-parse
    per extraction.

    Engine contract: 'integer' is the VARIANT's own inferred type
    (schema_of_variant ↔ DuckDB json_type), valid for |k| < 2^63 —
    both engines type a JSON integer as BIGINT-kind in that range.

    Shape: all classification is in-row; one (type × class) partial
    agg ends it."""
    e = t(spark, sf_dir, "events")
    v = F.try_parse_json(F.col("props"))
    k_str = F.try_variant_get(v, "$.k", "string")
    # the SUB-variant's own schema is the exact per-key type ('BIGINT'
    # for a JSON integer, None when $.k is missing) — a LIKE over the
    # whole object schema would false-match any key ending in 'k'
    # (review finding: '{"risk": 1}' classified int_k)
    is_int = (
        F.schema_of_variant(F.try_variant_get(v, "$.k", "variant"))
        == "BIGINT"
    )
    klass = (
        F.when(F.col("props").isNull(), "absent")
        .when(v.isNull(), "malformed")
        .when(is_int, "int_k")
        .when(k_str.isNotNull(), "nonint_k")
        .otherwise("no_usable_k")
    )
    k = F.when(is_int, F.try_variant_get(v, "$.k", "bigint"))
    return e.select(
        "event_type", klass.alias("klass"), k.alias("k")
    ).groupBy("event_type", "klass").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )
