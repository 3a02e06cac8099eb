"""Relational core: scans, filters, joins, aggregates, windows, set ops.

These are the [EXT] operators of SURVEY.md §2b–§2h, exercised over the
driver's TPC-H-ish tables. Every plan is declarative DataFrame API —
Catalyst does predicate pushdown, column pruning and join selection; the
tiny dimensions (region 5 rows, nation 25 rows, supplier 10 rows) are
explicitly broadcast.

Scale notes (100 TB):
- orders⋈lineitem is an equi-join on the natural key; at scale both sides
  shuffle-hash/sort-merge on l_orderkey — AQE handles skew splitting.
- dimension joins (region/nation/customer-side filters) broadcast, so the
  fact scan never shuffles for them.
- every aggregate here is partial-aggregable (map-side combine): sum/count
  over decimals, min/max — no holistic aggregation in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import (
    DEC,
    at_rank,
    davg,
    dsum,
    int_hist,
    mq,
    mqsum,
    msalt,
    munscale,
    sql_at_rank,
    sql_davg,
    sql_dsum,
    sql_int_hist,
    sql_msum,
    t,
)
from .catalog import register

# --------------------------------------------------------------------------
# q01 — TPC-H Q1-style pricing summary (the flagship scan+agg query)
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    tags=("relational", "agg", "flagship"),
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_msum('l_quantity')} AS sum_qty,
  {sql_msum('l_extendedprice')} AS sum_base_price,
  {sql_msum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
  {sql_msum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
  {sql_msum('l_quantity')} / COUNT(*) AS avg_qty,
  {sql_msum('l_extendedprice')} / COUNT(*) AS avg_price,
  {sql_msum('l_discount')} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → salted two-level hash-aggregate. The five money
    sums run as exact int64 partials per (group, salt) in the scan
    stage (mq/msalt/munscale — see _util's mergeable-money-sum note;
    measured 3.5× over the DECIMAL(38,6) accumulator at sf0.1, exact to
    any corpus size via the DECIMAL(38,0) merge), then merge per group.
    The shipdate filter and the 7-column projection push down into the
    parquet scan; both aggregation levels are map-side combinable."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    pre = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            msalt("l_extendedprice", "l_quantity").alias("_salt"),
        )
        .agg(
            F.sum(mq("l_quantity")).alias("_q"),
            F.sum(mq("l_extendedprice")).alias("_p"),
            F.sum(mq(disc_price)).alias("_dp"),
            F.sum(mq(charge)).alias("_ch"),
            F.sum(mq("l_discount")).alias("_d"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    n = F.sum("_n")
    return pre.groupBy("l_returnflag", "l_linestatus").agg(
        munscale("_q").alias("sum_qty"),
        munscale("_p").alias("sum_base_price"),
        munscale("_dp").alias("sum_disc_price"),
        munscale("_ch").alias("sum_charge"),
        (munscale("_q") / n).alias("avg_qty"),
        (munscale("_p") / n).alias("avg_price"),
        (munscale("_d") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


# --------------------------------------------------------------------------
# q02 — top-k over a fact-fact join
# --------------------------------------------------------------------------


@register(
    "q02_top_revenue_orders",
    tags=("relational", "join", "topk"),
    oracle=f"""
SELECT o.o_orderkey, o.o_orderdate,
       {sql_msum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem equi-join (both sides shuffle on orderkey; at scale
    this is the sort-merge join AQE loves), aggregate, global top-10 with a
    deterministic tiebreak. Spark's `orderBy(...).limit(k)` compiles to
    TakeOrderedAndProject — no full sort at scale."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(mqsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# q03 — TPC-H Q3-style shipping priority
# --------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    tags=("relational", "join", "topk"),
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dimension-side filter (mktsegment) broadcast into the
    fact join; date filters push into both parquet scans."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        F.broadcast(c.select("c_custkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# q05 — snowflake join through region→nation→customer→orders→lineitem
# --------------------------------------------------------------------------


@register(
    "q05_nation_revenue",
    tags=("relational", "join", "agg"),
    oracle=f"""
SELECT n.n_name,
       {sql_msum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n.n_name
""",
)
def q05_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic snowflake: the 5-row region and 25-row nation dims broadcast
    all the way down; only orders⋈lineitem shuffles. At 100 TB the dim
    broadcasts keep this a single fact-fact shuffle."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    dims = F.broadcast(
        r.join(n, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    return (
        c.join(dims, c.c_nationkey == F.col("n_nationkey"))
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", msalt("l_extendedprice", "l_discount").alias("_salt"))
        .agg(
            F.sum(mq(rev)).alias("_r"),
            F.count(F.lit(1)).alias("_n"),
        )
        .groupBy("n_name")
        .agg(
            munscale("_r").alias("revenue"),
            F.sum("_n").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q06 — single-row selective aggregate (pushdown showcase)
# --------------------------------------------------------------------------


@register(
    "q06_revenue_delta",
    tags=("relational", "agg", "pushdown"),
    oracle=f"""
SELECT {sql_msum('l_extendedprice * l_discount')} AS revenue_delta,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24.0
""",
)
def q06_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push into the parquet scan (PushedFilters);
    the aggregate is a single partial+final sum — minimal shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .groupBy(msalt("l_extendedprice", "l_discount").alias("_salt"))
        .agg(
            F.sum(mq(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "_r"
            ),
            F.count(F.lit(1)).alias("_n"),
        )
        .agg(
            munscale("_r").alias("revenue_delta"),
            # an empty two-level agg yields SUM = NULL where the
            # oracle's COUNT(*) yields 0 — coalesce the merged count
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# predicates: IN / LIKE / BETWEEN / boolean composition
# --------------------------------------------------------------------------


@register(
    "q10_filter_predicates",
    tags=("relational", "filter"),
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
FROM part
WHERE p_size IN (1, 5, 9, 13)
  AND p_type LIKE '%ECONOMY%'
  AND p_retailprice BETWEEN 200.0 AND 1500.0
  AND NOT (p_brand = 'Brand#13')
""",
)
def q10_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN/LIKE/BETWEEN/NOT — all pushed to the scan, no shuffle at all."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(1, 5, 9, 13)
        & F.col("p_type").like("%ECONOMY%")
        & F.col("p_retailprice").between(200.0, 1500.0)
        & (F.col("p_brand") != "Brand#13")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")


# --------------------------------------------------------------------------
# outer / semi / anti joins
# --------------------------------------------------------------------------


@register(
    "q11_left_join_order_counts",
    tags=("relational", "join"),
    oracle="""
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS order_count,
       COALESCE(CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE), 0.0) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def q11_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders; COUNT(col)
    skips the null-extended rows, matching SQL semantics exactly."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "q12_semi_join_big_spenders",
    tags=("relational", "join"),
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
)
""",
)
def q12_semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — dedups the probe side inside the join operator,
    never materializing the match multiplicity."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q13_anti_join_orderless",
    tags=("relational", "join"),
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q13_anti_join_orderless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — customers that never ordered."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# distinct aggregation
# --------------------------------------------------------------------------


@register(
    "q14_distinct_agg",
    tags=("relational", "agg"),
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
""",
)
def q14_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate — Spark expands these
    with the `expand` operator; partial aggregation still applies."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


# --------------------------------------------------------------------------
# rollup / cube (multi-dimensional aggregates)
# --------------------------------------------------------------------------


@register(
    "q15_rollup_status_priority",
    tags=("relational", "agg", "rollup"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
""",
)
def q15_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with GROUPING() markers so subtotal rows are
    distinguishable from genuine NULL keys.

    Empty-input contract (r9 all_empty fixture): on a zero-row table
    the SQL standard's () grouping set yields one grand-total row —
    DuckDB emits it, Spark's Expand-based rollup emits nothing. The
    engine behavior is pinned: grouping rows exist only for at least
    one input row, stated in the oracle as HAVING COUNT(*) > 0 (a
    no-op on any non-empty input, where every grouping-set row covers
    >= 1 row)."""
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


@register(
    "q16_cube_returnflag_status",
    tags=("relational", "agg", "cube"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
""",
)
def q16_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both lineitem status dimensions. Empty-input contract
    pinned as in q15 (HAVING COUNT(*) > 0 — oracle-side no-op on any
    non-empty input)."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


@register(
    "q20_topk_orders_per_priority",
    tags=("relational", "window", "topk"),
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS INT) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def q20_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the canonical window + filter. One shuffle on the
    partition key; at scale this beats a self-join top-k by orders of
    magnitude."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q21_running_customer_spend",
    tags=("relational", "window"),
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC NULLS LAST, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS running_spend,
       CAST(LAG(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC NULLS LAST, o_orderkey
       ) AS DOUBLE) AS prev_price,
       CAST(RANK() OVER (
         PARTITION BY o_custkey
         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
       ) AS INT) AS price_rank
FROM orders
""",
)
def q21_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + lag + rank in one pass over a single window
    partitioning (one shuffle, three frames). Running sum is decimal-exact
    so the prefix values are engine-invariant.

    NULL ordering is PINNED (NULLS LAST) in every window, both engines:
    Spark's ascending default is NULLS FIRST while DuckDB's is NULLS
    LAST, so a NULL o_orderdate silently reshuffles the running-sum
    prefix between engines (relational hostile probe finding)."""
    o = t(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey"
    )
    w_run = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w_run).cast("double").alias(
            "running_spend"
        ),
        F.lag("o_totalprice").over(w_time).cast("double").alias("prev_price"),
        F.rank().over(w_rank).cast("int").alias("price_rank"),
    )


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------


@register(
    "q22_set_ops_nations",
    tags=("relational", "setops"),
    oracle="""
SELECT 'both' AS tag, n FROM (
  SELECT DISTINCT c_nationkey AS n FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey AS n FROM supplier
)
UNION ALL
SELECT 'customer_only' AS tag, n FROM (
  SELECT DISTINCT c_nationkey AS n FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey AS n FROM supplier
)
""",
)
def q22_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL composition over nation keys."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n")).distinct()
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n")
    only = c.subtract(s).select(F.lit("customer_only").alias("tag"), "n")
    return both.unionByName(only)


# --------------------------------------------------------------------------
# scalar function suites
# --------------------------------------------------------------------------


@register(
    "q23_string_functions",
    tags=("relational", "scalar"),
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       SUBSTR(p_name, 1, 8) AS name_prefix,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       CONCAT_WS(':', p_brand, p_type) AS brand_type,
       REPLACE(p_type, 'ECONOMY', 'ECO') AS type_short,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       CASE WHEN p_brand IS NULL OR NOT contains(p_brand, '#')
            THEN NULL ELSE SPLIT_PART(p_brand, '#', 2) END AS brand_num
FROM part
""",
)
def q23_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite (REF's filename-surgery functions in their
    general form — SURVEY §2h): upper/substr/length/concat/replace/lpad/
    split-part, all whole-stage-codegen JVM expressions.

    NULL-string contract (hostile-dim probe): the oracle uses CONCAT_WS
    (plain CONCAT skips NULL args but keeps the ':' literal — a
    NULL-brand row concatenated to ':' while Spark's concat_ws gave '');
    brand_num is CASE-guarded because DuckDB's split_part returns ''
    for NULL input and for separator-less strings where Spark's
    getItem(1) is NULL on both."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split(F.col("p_brand"), "#").getItem(1).alias("brand_num"),
    )


@register(
    "q24_date_functions",
    tags=("relational", "scalar", "datetime"),
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
       CAST(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
       STRFTIME(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS order_date_iso
FROM orders
""",
)
def q24_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime suite incl. the reference's ISO-8601 'Z' formatting
    (copy_esrigrid…py:454–468 semantics via date_format)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "order_date_iso"
        ),
    )


@register(
    "q25_case_bucketing",
    tags=("relational", "scalar"),
    oracle="""
SELECT CASE
         WHEN c_acctbal < 0.0 THEN 'debt'
         WHEN c_acctbal < 3000.0 THEN 'low'
         WHEN c_acctbal < 7000.0 THEN 'mid'
         ELSE 'high'
       END AS balance_bucket,
       COUNT(*) AS n_customers,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
FROM customer
GROUP BY 1
""",
)
def q25_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + min/max (order-insensitive, no decimal
    laundering needed)."""
    c = t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0.0, "debt")
        .when(F.col("c_acctbal") < 3000.0, "low")
        .when(F.col("c_acctbal") < 7000.0, "mid")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("balance_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
    )


# --------------------------------------------------------------------------
# q04/q07/q08/q09 — the remaining TPC-H-shape classics (adapted to the
# driver schema: no partsupp/commitdate, so Q4's predicate becomes
# "shipped after the order date" and Q9's cost leg uses p_retailprice)
# --------------------------------------------------------------------------


@register(
    "q04_order_priority",
    tags=("relational", "join", "semi-join", "exists"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join. The
    equi-key (orderkey) carries the shuffle; the non-equi shipdate
    predicate is evaluated at probe time, so no extra exchange. The
    3-month orders filter pushes into the scan and shrinks the build
    side before the join."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_volume_shipping",
    tags=("relational", "join", "multi-join"),
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INT) AS l_year,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. supplier⋈nation and the customer-side nation broadcast;
    the nation-pair disjunction is applied after both broadcasts so
    Catalyst can still push each equality into its own dim filter.
    Only lineitem⋈orders and orders⋈customer shuffle at scale."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = t(spark, sf_dir, "nation")
    s = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(rev).alias("revenue"))
    )


@register(
    "q08_market_share",
    tags=("relational", "join", "agg", "share"),
    oracle="""
WITH vol AS (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey AND r_name = 'ASIA'
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                     ELSE CAST(0.0 AS DECIMAL(38,6)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM vol
GROUP BY o_year
""",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of supply revenue into ASIA
    customers, by order year. Both the numerator (conditional sum) and
    denominator reduce exactly in DECIMAL before one double division, so
    the share is engine-exact. One fact-fact shuffle (lineitem⋈orders),
    one orders⋈customer shuffle; every dim broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select("n_nationkey")
    )
    c = t(spark, sf_dir, "customer").join(
        asia_nations, F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("c_custkey")
    s = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0.0).cast(DEC)
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q09_product_profit",
    tags=("relational", "join", "multi-join", "agg"),
    oracle=f"""
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       {sql_msum('l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity')} AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%red%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY 1, 2
""",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (cost leg adapted to p_retailprice — no partsupp
    in the driver schema): profit on 'red' parts by supplier nation and
    order year. The p_name LIKE filter prunes part BEFORE its join —
    at 100 TB the filtered part side is small enough for AQE to convert
    lineitem⋈part to broadcast at runtime; supplier⋈nation broadcasts
    statically; lineitem⋈orders stays the one big shuffle."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation")
    s = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            msalt("l_extendedprice", "l_quantity").alias("_salt"),
        )
        .agg(F.sum(mq(profit)).alias("_p"))
        .groupBy("nation", "o_year")
        .agg(munscale("_p").alias("profit"))
    )


@register(
    "q57_returned_item_customers",
    tags=("relational", "join", "topk"),
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def q57_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers losing the most revenue to
    returns in one year. Returnflag + the date window push into the two
    fact scans; nation broadcasts; TakeOrdered caps the sort at k with a
    total-order tiebreak (revenue DESC, custkey ASC)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q58_top_supplier",
    tags=("relational", "agg", "subquery-max"),
    oracle=f"""
WITH srev AS (
  SELECT l_suppkey,
         {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, srev.total_revenue
FROM srev JOIN supplier s ON s.s_suppkey = srev.l_suppkey
WHERE srev.total_revenue = (SELECT MAX(total_revenue) FROM srev)
""",
)
def q58_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the quarter's max revenue. The
    revenue relation aggregates once and is joined against its own MAX —
    a scalar subquery the engine expresses as a 1-row broadcast join, so
    the fact scan+agg runs exactly once (no re-read for the MAX)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    srev = li.groupBy("l_suppkey").agg(dsum(rev).alias("total_revenue"))
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q59_large_volume_customers",
    tags=("relational", "join", "having"),
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 210.0
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       big.total_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q59_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customers. The HAVING aggregate runs on lineitem alone
    (partial-agg'd on l_orderkey, the join key — the groupBy output is
    already partitioned for the orders join, no second exchange of the
    fact side)."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 210.0)
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


@register(
    "q101_set_ops_all_multiset",
    tags=("relational", "setops", "multiset"),
    oracle="""
SELECT 'both_all' AS tag, n FROM (
  SELECT c_nationkey AS n FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS n FROM supplier
)
UNION ALL
SELECT 'customer_surplus' AS tag, n FROM (
  SELECT c_nationkey AS n FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS n FROM supplier
)
""",
)
def q101_set_ops_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the MULTISET set operations q22's
    distinct variants don't cover: per key, intersectAll keeps
    min(count_left, count_right) copies and exceptAll keeps the count
    surplus. Spark plans both as a single aggregate computing the two
    counts then a generate (replicate) — one shuffle per operand pair,
    no join."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    both = c.intersectAll(s).select(F.lit("both_all").alias("tag"), "n")
    surplus = c.exceptAll(s).select(F.lit("customer_surplus").alias("tag"), "n")
    return both.unionByName(surplus)


_FUZZ_MAX_DIST = 1  # edit-distance threshold (the synthetic
# Customer#NNNNNNNNN names form a dense near-match graph; distance 1
# keeps the result the interesting "one-typo" set rather than 200k rows)


@register(
    "q113_fuzzy_name_pairs",
    tags=("relational", "fuzzy-join", "levenshtein", "blocking"),
    oracle=f"""
WITH names AS (
  SELECT c_custkey AS id, c_name AS name,
         substr(c_name, 1, 16) AS blk, length(c_name) AS ln
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM names a JOIN names b
  ON a.blk = b.blk AND a.id < b.id
 AND abs(a.ln - b.ln) <= {_FUZZ_MAX_DIST}
WHERE levenshtein(a.name, b.name) <= {_FUZZ_MAX_DIST}
""",
)
def q113_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate string-match join: customer-name pairs within edit
    distance {_FUZZ_MAX_DIST} — the entity-resolution primitive (same
    customer, typo'd name). NOT a cross join: candidate pairs come from
    an equi-join on a 16-char prefix BLOCK plus a length band (a true
    edit-distance-{_FUZZ_MAX_DIST} pair can differ in length by at most
    {_FUZZ_MAX_DIST}; prefix blocking is the standard recall/cost dial
    in record linkage), and the O(len^2) levenshtein runs only on
    bucket-mates. Both engines implement the same unit-cost Levenshtein
    — an exact integer, so the threshold cut is engine-identical.

    At 100 TB the block key's cardinality must scale with the data —
    this default (16 chars) was WIDENED from 10 after the sf0.1 sweep
    exposed the pathology: the synthetic Customer#NNNNNNNNN names all
    share their first 10 chars, so a 10-char block collapsed 15k names
    into ONE bucket (112M pairs on a single shuffle partition). Wider
    prefix = more blocks = bounded per-block work, at the standard
    recall cost of missing pairs whose edits fall inside the block key
    — the recorded record-linkage tradeoff, identical in the oracle so
    parity is exact either way."""
    c = t(spark, sf_dir, "customer")
    names = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.substring("c_name", 1, 16).alias("blk"),
        F.length("c_name").alias("ln"),
    )
    a = names.alias("a")
    b = names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.id") < F.col("b.id"))
        & (F.abs(F.col("a.ln") - F.col("b.ln")) <= _FUZZ_MAX_DIST),
    )
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        dist.cast("int").alias("dist"),
    ).filter(F.col("dist") <= _FUZZ_MAX_DIST)


@register(
    "q168_customer_ltv_deciles",
    tags=("relational", "agg", "percentile", "two-level", "histogram"),
    oracle=f"""
WITH ltv AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS total_c,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
hist AS (
  {sql_int_hist('ltv', 'total_c',
                extra={'sum_orders': 'CAST(SUM(n_orders) AS BIGINT)'})}
)
SELECT CAST((10 * below) // n AS INT) AS decile,
       CAST(SUM(cnt) AS BIGINT) AS n_customers,
       CAST(SUM(sum_orders) AS BIGINT) AS n_orders,
       MIN(total_c) AS ltv_min_c,
       MAX(total_c) AS ltv_max_c,
       CAST(SUM(total_c * cnt) AS BIGINT) AS ltv_sum_c
FROM hist
GROUP BY CAST((10 * below) // n AS INT)
""",
)
def q168_customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value decile table: who the top 10% are and
    how much of total revenue they carry — the reduce-THEN-analyze
    two-level shape. Level 1 collapses the 100 TB order stream to one
    row per customer (partial-agg exchange; money through mq's exact
    FLOOR-cents int64 — engine-identical per row, exactly summable).
    Level 2 treats that customer-sized relation (orders/customer ≈
    constant, so ~1000× smaller) as the analysis input.

    r8 rewrite (q166's de-float): deciles were interpolated-percentile
    boundaries — the engine-version ulp hazard. Now level 2 is the
    integer rank machinery: an int_hist over the distinct LTV cents
    values (carrying each value's order count as histogram payload),
    decile = (10·below) DIV n, and every output an integer derived
    from the histogram. The holistic stage still only ever sees
    level-1 output — that ordering discipline is the whole 100 TB
    story, and the reason this is not q158 on a raw column. The
    histogram window is one sort of |distinct customer LTVs| ≤
    |customers| rows; SCALING.md's coarse/fine split or approx
    boundaries is the swap if that single sort ever binds."""
    o = t(spark, sf_dir, "orders")
    ltv = o.groupBy("o_custkey").agg(
        F.sum(mq("o_totalprice", 2)).alias("total_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    hist = int_hist(
        ltv,
        "total_c",
        extra={"sum_orders": F.sum("n_orders").cast("bigint")},
    )
    decile = F.expr("CAST((10 * below) div n AS INT)")
    return hist.groupBy(decile.alias("decile")).agg(
        F.sum("cnt").cast("bigint").alias("n_customers"),
        F.sum("sum_orders").cast("bigint").alias("n_orders"),
        F.min("total_c").alias("ltv_min_c"),
        F.max("total_c").alias("ltv_max_c"),
        F.sum(F.col("total_c") * F.col("cnt"))
        .cast("bigint")
        .alias("ltv_sum_c"),
    )


_RFM_CUTS = ", ".join(sql_at_rank("v", d, 5) for d in (1, 2, 3, 4))


@register(
    "q171_rfm_segments",
    tags=("relational", "agg", "percentile", "segmentation"),
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey,
         CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS r_day,
         CAST(COUNT(*) AS BIGINT) AS f,
         SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS m_c
  FROM orders GROUP BY o_custkey
),
long AS (
  SELECT dim, v FROM (
    SELECT 'r' AS dim, r_day AS v FROM rfm
    UNION ALL SELECT 'f', f FROM rfm
    UNION ALL SELECT 'm', m_c FROM rfm
  ) WHERE v IS NOT NULL
),
hist AS (
  {sql_int_hist('long', 'v', 'dim')}
),
cuts AS (
  SELECT dim, [{_RFM_CUTS}] AS cs FROM hist GROUP BY dim
),
bounds AS (
  SELECT MIN(CASE WHEN dim = 'r' THEN cs END) AS rb,
         MIN(CASE WHEN dim = 'f' THEN cs END) AS fb,
         MIN(CASE WHEN dim = 'm' THEN cs END) AS mb
  FROM cuts
),
scored AS (
  SELECT c.o_custkey, c.m_c,
         CAST(len(list_filter(b.rb, x -> x <= c.r_day)) AS INT) AS r_score,
         CAST(len(list_filter(b.fb, x -> x <= c.f)) AS INT) AS f_score,
         CAST(len(list_filter(b.mb, x -> x <= c.m_c)) AS INT) AS m_score
  FROM rfm c, bounds b
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(m_c) AS BIGINT) AS monetary_sum_c
FROM scored
GROUP BY r_score, f_score, m_score
""",
)
def q171_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 0–4 on Recency (last
    order day), Frequency (order count) and Monetary (exact cents
    spend) against GLOBAL quintile boundaries, then the 125-cell
    census with revenue per cell — the classic churn/VIP targeting
    grid ('445 lapsing whales' is r_score=0, f/m=4).

    Same two-level discipline as q168: the corpus collapses to one
    row per customer FIRST (one partial-agg exchange; recency as
    integer epoch-days, money through mq's exact FLOOR-cents int64),
    then three quintile cut vectors on the customer-sized aggregate
    broadcast back for in-row scoring — 12 integers against the scan,
    the shape that survives 100 TB.

    r8 rewrite (q166's de-float): the cuts were interpolated-
    percentile doubles — the engine-version ulp hazard. Now each cut
    is a discrete rank statistic (at_rank over the dimension's
    int_hist: smallest value reaching rank ceil(d·n/5)), the score is
    the count of cuts <= the customer's INTEGER value, and the cell
    revenue is an exact cents sum. All three dimensions and all
    comparisons are integers end to end.

    The three dimension histograms deliberately share ONE relation:
    rfm unpivots to (dim, value) long form, so one (dim, v) hash agg
    and one dim-partitioned window serve all three cut vectors —
    three separate per-column histograms would each re-derive the
    customer aggregate and re-scan orders (measured: 8 scans vs this
    form's 2, same as the pre-r8 plan)."""
    o = t(spark, sf_dir, "orders")
    # o_orderdate loads as TIMESTAMP_NTZ: unix_micros rejects it, but
    # the date cast is wall-clock-faithful and unix_date gives exact
    # integer epoch-days — mirroring the oracle's epoch_us // 86400e6
    # (order dates are midnight-aligned).
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_date(F.col("o_orderdate").cast("date")))
        .cast("bigint")
        .alias("r_day"),
        F.count(F.lit(1)).alias("f"),
        F.sum(mq("o_totalprice", 2)).alias("m_c"),
    )
    long = (
        rfm.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("r").alias("dim"), F.col("r_day").alias("v")
                    ),
                    F.struct(F.lit("f").alias("dim"), F.col("f").alias("v")),
                    F.struct(
                        F.lit("m").alias("dim"), F.col("m_c").alias("v")
                    ),
                )
            ).alias("dv")
        )
        .select("dv.dim", "dv.v")
        .filter(F.col("v").isNotNull())
    )
    hist = int_hist(long, "v", "dim")
    cuts = hist.groupBy("dim").agg(
        F.array(*[at_rank("v", d, 5) for d in (1, 2, 3, 4)]).alias("cs")
    )
    bounds = cuts.agg(
        F.min(F.when(F.col("dim") == "r", F.col("cs"))).alias("rb"),
        F.min(F.when(F.col("dim") == "f", F.col("cs"))).alias("fb"),
        F.min(F.when(F.col("dim") == "m", F.col("cs"))).alias("mb"),
    )

    def score(bs: str, val) -> F.Column:
        return F.size(F.filter(F.col(bs), lambda x: x <= val)).cast("int")

    scored = rfm.crossJoin(F.broadcast(bounds)).select(
        "m_c",
        score("rb", F.col("r_day")).alias("r_score"),
        score("fb", F.col("f")).alias("f_score"),
        score("mb", F.col("m_c")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m_c").cast("bigint").alias("monetary_sum_c"),
    )


@register(
    "q174_supplier_concentration",
    tags=("relational", "join", "agg", "diversity"),
    oracle="""
WITH vol AS (
  SELECT p.p_type, l.l_suppkey,
         CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_type, l.l_suppkey
)
SELECT p_type,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_qty,
       CAST(SUM(CAST(FLOOR(qty * qty) AS BIGINT)) AS DOUBLE)
         / (CAST(CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
            * CAST(CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)) AS hhi,
       CAST(MAX(qty) AS DOUBLE)
         / CAST(CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS top_share
FROM vol
GROUP BY p_type
""",
)
def q174_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration (Herfindahl) index per part type: Σ of
    squared supplier volume shares — the supply-chain-risk sibling of
    q165's corpus diversity (HHI → 1 means one supplier owns the
    category; antitrust-style 0.25 is the classic alarm line).

    Exactness: l_quantity is integer-valued, so the per-supplier
    decimal rollup is exact and its square is an exact double
    (< 2^53); Σqty² goes through FLOOR→BIGINT (exact — no fractional
    part to lose) and the HHI denominator is a DECIMAL product, so no
    double is ever reduced. Shape: lineitem ⋈ broadcast(part) — the
    fact table never shuffles for the join — then a (type, supplier)
    partial agg and a |types| rollup."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    qty = F.col("qty")
    sdec = F.sum(qty.cast(DEC))
    return vol.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        sdec.cast("double").alias("total_qty"),
        (
            F.sum(F.floor(qty * qty).cast("bigint")).cast("double")
            / (sdec.cast("double") * sdec.cast("double"))
        ).alias("hhi"),
        (F.max(qty).cast("double") / sdec.cast("double")).alias("top_share"),
    )


_LORENZ_BUCKETS = 20


@register(
    "q184_revenue_lorenz",
    tags=("relational", "agg", "concentration", "two-level"),
    oracle=f"""
WITH ltv AS (
  SELECT o_custkey,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT total,
         ntile({_LORENZ_BUCKETS}) OVER (ORDER BY total ASC, o_custkey ASC)
           AS vigintile
  FROM ltv
)
SELECT vigintile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(CAST(total AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS bucket_revenue,
       CAST(SUM(SUM(CAST(total AS DECIMAL(38,6)))) OVER
              (ORDER BY vigintile ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / CAST(CAST(SUM(SUM(CAST(total AS DECIMAL(38,6)))) OVER () AS VARCHAR)
                AS DOUBLE)
         AS cum_revenue_share
FROM ranked
GROUP BY vigintile
""",
)
def q184_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of revenue concentration: customers ranked by
    lifetime value, cumulative revenue share per vigintile — 'the top
    5% of customers carry X% of revenue' read straight off the last
    rows (q148's Gini gives the scalar; this gives the CURVE the
    scalar summarizes, which is what a risk review actually looks at).

    The ntile here is legitimate where q158 banned it: it ranks the
    CUSTOMER AGGREGATE (orders/customer ≈ constant → ~1000× smaller
    than the corpus), not the raw table — the q168 reduce-then-analyze
    discipline. Tie-break on o_custkey makes the split deterministic;
    revenue stays decimal-exact through every sum; the cumulative
    share is a window over {_LORENZ_BUCKETS} grouped rows."""
    o = t(spark, sf_dir, "orders")
    ltv = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("total"))
    wr = Window.orderBy(F.asc("total"), F.asc("o_custkey"))
    ranked = ltv.select(
        "total", F.ntile(_LORENZ_BUCKETS).over(wr).alias("vigintile")
    )
    grouped = ranked.groupBy("vigintile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("total").alias("bucket_revenue"),
        F.sum(F.col("total").cast(DEC)).alias("_dec_rev"),
    )
    wcum = Window.orderBy("vigintile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return grouped.select(
        "vigintile",
        "n_customers",
        "bucket_revenue",
        (
            F.sum("_dec_rev").over(wcum).cast("double")
            / F.sum("_dec_rev").over(wall).cast("double")
        ).alias("cum_revenue_share"),
    )


@register(
    "q192_fulfillment_sla",
    tags=("relational", "join", "percentile", "sla"),
    oracle=f"""
WITH lat AS (
  SELECT o.o_orderpriority,
         CAST(epoch_us(l.l_shipdate) // 86400000000
              - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
nn AS (SELECT o_orderpriority, days FROM lat WHERE days IS NOT NULL),
hist AS (
  {sql_int_hist('nn', 'days', 'o_orderpriority')}
),
pct AS (
  SELECT o_orderpriority,
         {sql_at_rank('days', 1, 2)} AS p50_days,
         {sql_at_rank('days', 9, 10)} AS p90_days,
         {sql_at_rank('days', 99, 100)} AS p99_days
  FROM hist GROUP BY o_orderpriority
)
SELECT l.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       MIN(p.p50_days) AS p50_days,
       MIN(p.p90_days) AS p90_days,
       MIN(p.p99_days) AS p99_days,
       CAST(MAX(l.days) AS BIGINT) AS max_days,
       CAST(SUM(CASE WHEN l.days > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_90d
FROM lat l LEFT JOIN pct p
  ON p.o_orderpriority IS NOT DISTINCT FROM l.o_orderpriority
GROUP BY l.o_orderpriority
""",
)
def q192_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA table: latency percentiles (order date →
    line-item ship date, integer epoch-days) per order priority, plus
    the tail count beyond a 90-day breach line — the operations
    dashboard query that says whether '1-URGENT' actually ships
    faster, with the p99/max tail that averages hide.

    r8 rewrite (q166's de-float): the percentiles were interpolated
    quantile_cont doubles — the engine-version ulp hazard — and are
    now discrete order statistics (at_rank over the per-priority
    integer-day int_hist: smallest day count reaching rank ceil(q·n)),
    emitted as exact integer days. A priority whose latencies are all
    NULL keeps its row via the null-safe LEFT join (NULL percentiles,
    breach count 0) — presence semantics pinned in both engines.

    Shape: the orders side projects to (key, priority, date) before
    the fact join (shuffle on orderkey, AQE-skew-safe); the day
    histogram is ≤5 priorities × the day DOMAIN (a few hundred values)
    — broadcast-sized at any corpus scale. At 100 TB swap
    approx_percentile, breach count unchanged."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    days = (
        F.unix_date(F.col("l_shipdate").cast("date"))
        - F.unix_date(F.col("o_orderdate").cast("date"))
    ).cast("bigint")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", days.alias("days")
    )
    hist = int_hist(
        lat.filter(F.col("days").isNotNull()), "days", "o_orderpriority"
    )
    pct = hist.groupBy("o_orderpriority").agg(
        at_rank("days", 1, 2).alias("p50_days"),
        at_rank("days", 9, 10).alias("p90_days"),
        at_rank("days", 99, 100).alias("p99_days"),
    )
    joined = lat.join(
        F.broadcast(pct.withColumnRenamed("o_orderpriority", "_prio")),
        lat["o_orderpriority"].eqNullSafe(F.col("_prio")),
        "left",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("p50_days").alias("p50_days"),
        F.min("p90_days").alias("p90_days"),
        F.min("p99_days").alias("p99_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.sum(F.when(F.col("days") > 90, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_90d"),
    )


@register(
    "q193_bipartite_degrees",
    tags=("relational", "graph", "histogram"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
pdeg AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS deg FROM edges
  GROUP BY l_partkey
),
sdeg AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS deg FROM edges
  GROUP BY l_suppkey
)
SELECT 'part' AS side, deg,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM pdeg GROUP BY deg
UNION ALL
SELECT 'supplier' AS side, deg,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM sdeg GROUP BY deg
""",
)
def q193_bipartite_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part↔supplier bipartite graph (how
    many suppliers serve each part, how many parts each supplier
    carries) — the sparsity census run before any co-occurrence or
    recommender model on interaction data: a supplier side with degree
    p99 = 3 means the lift/embedding models (q134/q129) are starving,
    and a single 10⁶-degree node is the skew that q138's census and
    salting exist for.

    Shape: one distinct partial agg on the edge pair, two degree
    rollups (each shrinking), two ~degree-bounded histogram aggs,
    unioned. All integers."""
    li = t(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    pdeg = edges.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("deg"))
    sdeg = edges.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("deg"))
    ph = pdeg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes")).select(
        F.lit("part").alias("side"), "deg", "n_nodes"
    )
    sh = sdeg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes")).select(
        F.lit("supplier").alias("side"), "deg", "n_nodes"
    )
    return ph.unionByName(sh)


@register(
    "q194_order_cadence_cv",
    tags=("relational", "window", "two-level", "histogram"),
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000
           - lag(epoch_us(o_orderdate) // 86400000000) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS gap_days
  FROM orders
),
per_cust AS (
  SELECT o_custkey,
         CAST(COUNT(gap_days) AS BIGINT) AS k,
         CAST(SUM(gap_days) AS BIGINT) AS sg,
         CAST(SUM(gap_days * gap_days) AS BIGINT) AS sgg
  FROM gaps GROUP BY o_custkey
),
cv AS (
  SELECT o_custkey,
         CASE WHEN k >= 2 AND sg > 0
              THEN sqrt(CAST(k * sgg - sg * sg AS DOUBLE)) / sg
              ELSE NULL END AS cv
  FROM per_cust
)
SELECT CASE WHEN cv IS NULL THEN -1
            ELSE CAST(FLOOR(cv * 4e0) AS INT) END AS cv_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       MIN(cv) AS cv_min,
       MAX(cv) AS cv_max
FROM cv
GROUP BY cv_bucket
""",
)
def q194_order_cadence_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence regularity census: per customer, the
    coefficient of variation of inter-order gaps (subscription-like
    regulars sit near 0, erratic buyers far above 1), bucketed at
    0.25 width — the segmentation input for 'predictable reorder'
    campaigns and the churn model's cadence feature, distributed as a
    histogram instead of 1.5M per-customer rows. Bucket −1 holds
    customers with <2 gaps or zero mean gap (CV undefined).

    Determinism: CV = √(k·Σg²−(Σg)²)/Σg from exact BIGINT gap
    sufficient statistics (the population-variance identity again —
    no mean subtraction, no double sums), floor-bucketed on identical
    doubles. Shape: one custkey window+agg exchange (the lag and the
    rollup cluster identically), then a ~bounded histogram agg."""
    o = t(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date")).cast("bigint")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey", (day - F.lag(day).over(w)).alias("gap_days")
    )
    g = F.col("gap_days")
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count(g).alias("k"),
        F.sum(g).alias("sg"),
        F.sum(g * g).alias("sgg"),
    )
    cv = F.when(
        (F.col("k") >= 2) & (F.col("sg") > 0),
        F.sqrt(
            (F.col("k") * F.col("sgg") - F.col("sg") * F.col("sg")).cast(
                "double"
            )
        )
        / F.col("sg"),
    ).otherwise(F.lit(None).cast("double"))
    cvd = per_cust.select(cv.alias("cv"))
    bucket = F.when(F.col("cv").isNull(), F.lit(-1)).otherwise(
        F.floor(F.col("cv") * F.lit(4.0)).cast("int")
    )
    return cvd.groupBy(bucket.alias("cv_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("cv").alias("cv_min"),
        F.max("cv").alias("cv_max"),
    )


@register(
    "q199_repeat_purchase_cohorts",
    tags=("relational", "cohort", "two-level"),
    oracle="""
WITH firsts AS (
  SELECT o_custkey,
         MIN(epoch_us(o_orderdate)) AS first_us,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT strftime(CAST(to_timestamp(first_us / 1000000.0) AS DATE), '%Y-%m')
         AS cohort_month,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS repeat_rate,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders_total
FROM firsts
GROUP BY cohort_month
""",
)
def q199_repeat_purchase_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate by acquisition cohort: customers grouped
    by first-order month, each cohort's share who ever ordered again —
    the retention headline that q87's triangle details period by
    period, here as the one-line-per-cohort executive readout.

    Cohort key is a 'YYYY-MM' string from the first order's UTC date
    (string-formatted identically by both engines from the same
    integer epoch). Shape: one custkey rollup exchange over orders,
    then a |months| agg."""
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "first_us"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    cohort = F.date_format(
        F.timestamp_micros(F.col("first_us")).cast("date"), "yyyy-MM"
    )
    rpt = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return firsts.groupBy(cohort.alias("cohort_month")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        rpt.cast("bigint").alias("n_repeat"),
        (rpt.cast("double") / F.count(F.lit(1))).alias("repeat_rate"),
        F.sum("n_orders").cast("bigint").alias("n_orders_total"),
    )


# --------------------------------------------------------------------------
# q225–q228 — the four hard classic shapes (TPC-H Q19/Q21/Q22/Q20 forms)
# --------------------------------------------------------------------------


@register(
    "q225_ored_predicate_revenue",
    tags=("relational", "join", "disjunctive-predicate"),
    oracle=f"""
SELECT
  {sql_msum('l_extendedprice * (1.0 - l_discount)')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1.0 AND 20.0)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 5.0 AND 40.0)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 10.0 AND 60.0)
""",
)
def q225_ored_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of conjunctive predicate groups
    that straddles the join — each branch constrains BOTH sides
    (part.brand/size and lineitem.quantity), so naive evaluation joins
    first and filters last. The scale-correct plan: Catalyst extracts
    the common equi-key (partkey), derives the per-side implied
    disjunctions (brand IN the 3 brands; quantity in the union range)
    and pushes them into each scan as `PushedFilters`, then evaluates
    the residual OR-of-ANDs at probe time. part is dimension-sized →
    broadcast; the fact side never shuffles."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & qty.between(1.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & qty.between(5.0, 40.0)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & qty.between(10.0, 60.0)
        )
    )
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # single global group → salted int64 partials (q01's msum form):
    # one group's int64 sum would overflow around 9e7 money rows
    pre = (
        joined.filter(branch)
        .groupBy(msalt("l_extendedprice", "l_quantity").alias("_salt"))
        .agg(
            F.sum(mq(rev)).alias("_r"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return pre.agg(
        munscale("_r").alias("revenue"),
        # COUNT(*) over an empty set is 0; SUM over empty partials is
        # NULL — coalesce so the engines agree when nothing matches
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n_lines"),
    )


_WAIT_DAYS = 730  # "late" = shipped > 2 years after the order date


@register(
    "q226_waiting_suppliers",
    tags=("relational", "join", "exists", "decorrelation"),
    oracle=f"""
WITH li AS (
  -- NULL-suppkey lines are unattributable and the correlated <> probes
  -- are NULL-rejecting anyway: exclude them identically in both engines
  SELECT * FROM lineitem WHERE l_suppkey IS NOT NULL
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s, li l1, orders o
WHERE s.s_suppkey = l1.l_suppkey
  AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL {_WAIT_DAYS} DAY
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate
                                        + INTERVAL {_WAIT_DAYS} DAY)
GROUP BY s_name
""",
)
def q226_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the classic double-correlated EXISTS +
    NOT EXISTS: per supplier, count finished multi-supplier orders
    where THIS supplier shipped late (> {_WAIT_DAYS} days after the
    order date) and no OTHER supplier in the order did.

    The correlated form re-probes lineitem twice per row; the
    scale-correct decorrelation is ONE aggregate over the order key:
    per (orderkey, suppkey) compute any_late, then per order count
    suppliers and late suppliers — an order qualifies a supplier iff
    that supplier is late, n_suppliers >= 2 and n_late == 1. One
    shuffle on orderkey (which orders⋈lineitem already needs), a
    supplier-sized final agg, and the 10-row supplier dim broadcast
    for names. Both EXISTS probes become integer comparisons on the
    aggregate — no second or third lineitem scan."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey").isNotNull()
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_WAIT_DAYS} DAYS"
    )
    per_pair = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late.cast("int")).alias("any_late"),
            # Q21 counts qualifying l1 ROWS, not orders: a supplier
            # with three late lines in one order scores three
            F.sum(late.cast("int")).alias("n_late_lines"),
        )
    )
    worder = Window.partitionBy("l_orderkey")
    audited = per_pair.select(
        "l_suppkey",
        "any_late",
        "n_late_lines",
        F.count(F.lit(1)).over(worder).alias("n_supp"),
        F.sum("any_late").over(worder).alias("n_late"),
    )
    waiting = audited.filter(
        (F.col("any_late") == 1)
        & (F.col("n_supp") >= 2)
        & (F.col("n_late") == 1)
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )


_DORMANT_CUTOFF = "2000-09-01"
_DORMANT_NATIONS = (1, 3, 5, 7, 9, 11, 13)


@register(
    "q227_dormant_high_balance",
    tags=("relational", "subquery", "scalar-subquery", "anti-join"),
    oracle=f"""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_msum('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_nationkey IN {_DORMANT_NATIONS}
  AND c_acctbal > (
    SELECT {sql_davg('c_acctbal')} FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN {_DORMANT_NATIONS}
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{_DORMANT_CUTOFF}'
  )
GROUP BY c_nationkey
""",
)
def q227_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery as a filter threshold
    + NOT EXISTS anti-join. Dormant high-balance customers — above the
    average positive balance of their market (the scalar subquery) and
    no order since {_DORMANT_CUTOFF} (the anti-join) — rolled up per
    nation.

    Scale shape: the scalar is a 1-row aggregate (exact decimal sum /
    count, deterministic in both engines) cross-joined as a broadcast
    — never a per-row correlated probe. The anti-join's probe side is
    pre-filtered to post-cutoff orders (pushed to the scan) and keyed
    on custkey; customers is the smaller side but stays the probe to
    preserve anti semantics."""
    nations = list(_DORMANT_NATIONS)
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(nations)
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("thr"))
    )
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_DORMANT_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    dormant = c.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    pre = (
        dormant.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .groupBy("c_nationkey", msalt("c_acctbal", "c_custkey").alias("_salt"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(mq("c_acctbal")).alias("_q"),
        )
    )
    return pre.groupBy("c_nationkey").agg(
        F.sum("_n").cast("bigint").alias("numcust"),
        munscale("_q").alias("totacctbal"),
    )


_DOMINANT_SINCE = "2000-01-01"


@register(
    "q228_dominant_suppliers",
    tags=("relational", "agg", "decorrelation", "fraction-of-total"),
    oracle=f"""
WITH sp AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(FLOOR(l_quantity * 1000000.0) AS BIGINT)) AS pair_q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_DOMINANT_SINCE}'
    AND l_partkey IS NOT NULL
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, SUM(pair_q) AS total_q,
         COUNT(*) AS n_suppliers
  FROM sp GROUP BY l_partkey
)
SELECT s_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominated_parts,
       CAST(SUM(pair_q) AS DOUBLE) / 1000000.0 AS dominated_qty
FROM sp JOIN tot USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE 2 * pair_q > total_q AND n_suppliers >= 2
GROUP BY s_name
""",
)
def q228_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape, decorrelated: the original's correlated scalar
    subquery ("this supplier's quantity vs a threshold over ALL
    shipments of the part") becomes a fraction-of-total — per
    (part, supplier) quantity vs a window total over the part. A
    supplier *dominates* a contested part (>= 2 suppliers shipped it
    since {_DOMINANT_SINCE}) when it shipped more than half the
    part's total quantity.

    Scale shape: the groupBy exchange on (partkey, suppkey) runs AFTER
    a map-side partial sum, so shuffle #1 carries pair partials, never
    raw lineitems (repartitioning raw rows by partkey to share one
    exchange with the window was evaluated and rejected — it forfeits
    the partial agg and ships the full fact table); the window's
    partkey exchange then moves only the already-tiny pair relation.
    Quantities are exact micro-scaled int64 (mq) so the 2*pair > total
    comparison is bit-deterministic; the supplier dim broadcasts."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_DOMINANT_SINCE).cast("timestamp"))
        # NULL partkeys would survive the window partition here but die
        # in the oracle's USING join — excluded identically instead
        & F.col("l_partkey").isNotNull()
    ).select("l_partkey", "l_suppkey", "l_quantity")
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(mq("l_quantity")).alias("pair_q")
    )
    wpart = Window.partitionBy("l_partkey")
    audited = sp.select(
        "l_suppkey",
        "pair_q",
        F.sum("pair_q").over(wpart).alias("total_q"),
        F.count(F.lit(1)).over(wpart).alias("n_suppliers"),
    ).filter(
        (F.lit(2) * F.col("pair_q") > F.col("total_q"))
        & (F.col("n_suppliers") >= 2)
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        audited.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dominated_parts"),
            (F.sum("pair_q").cast("double") / F.lit(1e6)).alias(
                "dominated_qty"
            ),
        )
    )


# --------------------------------------------------------------------------
# q235 — exact weighted median (histogram + cumulative-weight window)
# --------------------------------------------------------------------------


@register(
    "q235_weighted_median_price",
    tags=("relational", "agg", "robust-stats", "window"),
    oracle="""
WITH li AS (
  SELECT p_brand,
         CAST(FLOOR((l_extendedprice / l_quantity) * 100.0) AS BIGINT)
           AS price_q,
         CAST(FLOOR(l_quantity) AS BIGINT) AS w
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_quantity > 0.0 AND l_extendedprice IS NOT NULL
),
hist AS (
  SELECT p_brand, price_q, SUM(w) AS wv
  FROM li GROUP BY p_brand, price_q
),
cum AS (
  SELECT p_brand, price_q, wv,
         SUM(wv) OVER (PARTITION BY p_brand ORDER BY price_q ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(wv) OVER (PARTITION BY p_brand) AS total_w
  FROM hist
)
SELECT p_brand,
       CAST(total_w AS BIGINT) AS total_weight,
       CAST(MIN(price_q) AS BIGINT) AS median_price_q
FROM cum
WHERE 2 * cw >= total_w
GROUP BY p_brand, total_w
""",
)
def q235_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median unit price per brand — the
    robust price point (half the shipped units cost less): the
    weighted generalization q28's exact percentiles don't cover.
    Lower weighted median: smallest price with cumulative weight
    ≥ half the total — found as MIN over the qualifying frontier, so
    no row_number pass. Unit price is one IEEE division (correctly
    rounded, bit-identical both engines) quantized to cents at the
    row; weights and cumulative sums are pure int64.

    Scale shape: histogram-first (one (brand, cent-price) partial agg
    bounds the relation by the PRICE GRID, not the row count), then a
    brand-partitioned cumulative window and a frontier-min agg. The
    classic percentile_cont-style global sort never appears."""
    li = t(spark, sf_dir, "lineitem").filter(
        # price-less rows would put a NULL cent-price bucket at opposite
        # ends of the two engines' cumulative windows (the q182/q240
        # NULL-ordering lesson) — excluded identically instead
        (F.col("l_quantity") > 0.0) & F.col("l_extendedprice").isNotNull()
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        "p_brand",
        F.floor(
            (F.col("l_extendedprice") / F.col("l_quantity")) * 100.0
        ).cast("bigint").alias("price_q"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("w"),
    )
    hist = rows.groupBy("p_brand", "price_q").agg(F.sum("w").alias("wv"))
    wcum = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("price_q").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = Window.partitionBy("p_brand")
    cum = hist.select(
        "p_brand",
        "price_q",
        F.sum("wv").over(wcum).alias("cw"),
        F.sum("wv").over(wb).alias("total_w"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("total_w"))
        .groupBy("p_brand", "total_w")
        .agg(F.min("price_q").cast("bigint").alias("median_price_q"))
        .select(
            "p_brand",
            F.col("total_w").cast("bigint").alias("total_weight"),
            "median_price_q",
        )
    )


# --------------------------------------------------------------------------
# q242 — cross-period revenue rank movers
# --------------------------------------------------------------------------

_RANK_SPLIT = "1998-01-01"  # period A < split <= period B


@register(
    "q242_revenue_rank_movers",
    tags=("relational", "window", "rank", "drift"),
    oracle=f"""
WITH rev AS (
  SELECT l_partkey,
         CASE WHEN l_shipdate < TIMESTAMP '{_RANK_SPLIT}' THEN 0 ELSE 1 END
           AS period,
         SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000.0)
                  AS BIGINT)) AS rev_q
  FROM lineitem
  GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, period, rev_q,
         RANK() OVER (PARTITION BY period
                      ORDER BY rev_q DESC, l_partkey ASC) AS rnk
  FROM rev
)
SELECT a.l_partkey,
       CAST(a.rnk AS BIGINT) AS rank_before,
       CAST(b.rnk AS BIGINT) AS rank_after,
       CAST(a.rnk - b.rnk AS BIGINT) AS rank_gain,
       CAST(a.rev_q AS DOUBLE) / 1000000.0 AS rev_before,
       CAST(b.rev_q AS DOUBLE) / 1000000.0 AS rev_after
FROM ranked a JOIN ranked b
  ON a.l_partkey = b.l_partkey AND a.period = 0 AND b.period = 1
WHERE ABS(a.rnk - b.rnk) >= 20
""",
)
def q242_revenue_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-period league-table movers: parts whose revenue RANK
    jumped or collapsed by ≥ 20 places between the pre- and
    post-{_RANK_SPLIT} periods — the drift view a merchandiser (or a
    corpus curator watching source share) reads, where q131's
    distribution drift reports a scalar. Ranks, not revenues, are
    compared, so a market-wide level shift cancels out.

    Shape: ONE (part, period) partial agg over the fact scan — the
    only exchange that carries data-sized input; everything after
    (period window, period-split self-join, final filter) moves the
    part-dimension-sized aggregate only. Revenue quantized int64 at
    the row; rank ties pinned by part key."""
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy(
        "l_partkey",
        F.when(
            F.col("l_shipdate") < F.lit(_RANK_SPLIT).cast("timestamp"), 0
        ).otherwise(1).alias("period"),
    ).agg(
        F.sum(
            mq(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("rev_q")
    )
    w = Window.partitionBy("period").orderBy(
        F.col("rev_q").desc(), F.col("l_partkey").asc()
    )
    ranked = rev.withColumn("rnk", F.rank().over(w))
    a = ranked.filter(F.col("period") == 0).select(
        "l_partkey",
        F.col("rnk").alias("rank_before"),
        F.col("rev_q").alias("rev_q_before"),
    )
    b = ranked.filter(F.col("period") == 1).select(
        F.col("l_partkey").alias("pk2"),
        F.col("rnk").alias("rank_after"),
        F.col("rev_q").alias("rev_q_after"),
    )
    return (
        a.join(b, F.col("l_partkey") == F.col("pk2"))
        .filter(F.abs(F.col("rank_before") - F.col("rank_after")) >= 20)
        .select(
            "l_partkey",
            F.col("rank_before").cast("bigint").alias("rank_before"),
            F.col("rank_after").cast("bigint").alias("rank_after"),
            (F.col("rank_before") - F.col("rank_after"))
            .cast("bigint").alias("rank_gain"),
            (F.col("rev_q_before").cast("double") / F.lit(1e6)).alias(
                "rev_before"
            ),
            (F.col("rev_q_after").cast("double") / F.lit(1e6)).alias(
                "rev_after"
            ),
        )
    )


# --------------------------------------------------------------------------
# q243 — order backlog time series (two-cumulative-series diff)
# --------------------------------------------------------------------------


@register(
    "q243_order_backlog_series",
    tags=("relational", "timeseries", "window", "ops"),
    oracle="""
WITH opened AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_opened
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
),
closed AS (
  SELECT CAST(date_trunc('day', last_ship) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_closed
  FROM (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey)
  WHERE last_ship IS NOT NULL GROUP BY 1
),
merged AS (
  SELECT COALESCE(o.day, c.day) AS day,
         COALESCE(o.n_opened, 0) AS n_opened,
         COALESCE(c.n_closed, 0) AS n_closed
  FROM opened o FULL OUTER JOIN closed c ON o.day = c.day
)
SELECT day, n_opened, n_closed,
       CAST(SUM(n_opened - n_closed) OVER (
         ORDER BY day ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS backlog
FROM merged
""",
)
def q243_order_backlog_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order BACKLOG time series — the event-sourcing census every
    fulfillment/ops dashboard leads with: orders opened per day minus
    orders fully shipped per day (an order closes when its LAST
    lineitem ships), accumulated into the standing backlog. Orders
    with no shippable lineitems stay in the backlog permanently —
    that terminal plateau IS the data-quality signal (q13's anti-join
    population, seen as a time series).

    Shape: one order-key rollup of lineitem (the only data-sized
    exchange), two calendar-bounded daily censuses FULL-OUTER merged
    on the day spine, one ordered cumulative window over the merged
    calendar. All counts int64."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    opened = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_opened"))
    last = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .filter(F.col("last_ship").isNotNull())
    )
    closed = last.groupBy(
        F.date_trunc("day", F.col("last_ship")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_closed"))
    merged = (
        opened.withColumnRenamed("day", "o_day")
        .join(
            closed.withColumnRenamed("day", "c_day"),
            F.col("o_day") == F.col("c_day"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("o_day"), F.col("c_day")).alias("day"),
            F.coalesce(F.col("n_opened"), F.lit(0)).alias("n_opened"),
            F.coalesce(F.col("n_closed"), F.lit(0)).alias("n_closed"),
        )
    )
    wcum = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return merged.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(wcum).cast("bigint").alias("backlog"),
    )


# --------------------------------------------------------------------------
# q248 — right-to-be-forgotten sweep census (deletion-impact audit)
# --------------------------------------------------------------------------

# content-addressed "deletion request" set: custkeys whose
# md5('forget:'||key) starts with a zero nibble (~1/16 of customers) —
# deterministic, reshuffle-stable, no side-channel fixture needed
_FORGET_PRED = "substr(md5('forget:' || CAST({k} AS VARCHAR)), 1, 1) = '0'"


@register(
    "q248_forget_sweep_census",
    tags=("relational", "privacy", "ops", "semi-join"),
    oracle=f"""
WITH forget AS (
  SELECT c_custkey FROM customer
  WHERE {_FORGET_PRED.format(k='c_custkey')}
),
ords AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM forget)
)
SELECT 'customer' AS table_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM forget) AS n_rows_to_delete
UNION ALL
SELECT 'orders', (SELECT CAST(COUNT(*) AS BIGINT) FROM ords)
UNION ALL
SELECT 'lineitem',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM ords))
""",
)
def q248_forget_sweep_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact sweep — the privacy op every
    GDPR/CCPA-bound pipeline runs before a purge: given a deletion-
    request set (here content-addressed: ~1/16 of custkeys by md5
    nibble, deterministic and reshuffle-stable), count every row the
    cascade touches — the customers themselves, their orders, and the
    lineitems under those orders. The census is the dry-run that
    sizes tombstone writes and validates referential cascade BEFORE
    any data moves.

    Shape at scale: the request set and its order keys flow as LEFT
    SEMI joins (never materializing match multiplicity); the fact
    table is touched once per hop with the semi probe on its natural
    key. Three 1-row counts union — the output is tables, not data."""
    c = t(spark, sf_dir, "customer")
    # Spark twin of _FORGET_PRED (CAST AS STRING; Spark's parser rejects
    # bare VARCHAR)
    forget = c.filter(
        F.substring(
            F.md5(
                F.concat(F.lit("forget:"), F.col("c_custkey").cast("string"))
            ),
            1,
            1,
        )
        == "0"
    ).select("c_custkey")
    o = t(spark, sf_dir, "orders")
    ords = o.join(
        forget, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey")
    li = t(spark, sf_dir, "lineitem")
    li_hit = li.join(
        ords, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )

    def census(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows_to_delete")
        ).select(F.lit(name).alias("table_name"), "n_rows_to_delete")

    return (
        census("customer", forget)
        .unionByName(census("orders", ords))
        .unionByName(census("lineitem", li_hit))
    )


# --------------------------------------------------------------------------
# q252 — k-anonymity / l-diversity privacy-risk census
# --------------------------------------------------------------------------

_KANON_K = 5   # classes smaller than this are re-identification risks
_LDIV_L = 2    # classes with fewer distinct sensitive values lack diversity


@register(
    "q252_privacy_risk_census",
    tags=("relational", "privacy", "agg", "ops"),
    oracle=f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT CASE WHEN c_acctbal IS NOT NULL
                    THEN CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) END)
              AS BIGINT) AS n_sensitive
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_classes_below_k,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN class_size ELSE 0 END)
            AS BIGINT) AS n_rows_below_k,
       CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_classes_below_l,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size
FROM classes
""",
)
def q252_privacy_risk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity scorecard — the privacy audit run
    before releasing a table keyed on quasi-identifiers: group by the
    QI tuple (nation, market segment), measure each equivalence
    class's size (re-identification risk when < {_KANON_K}) and its
    diversity of the sensitive attribute (balance bands; attribute
    disclosure risk when < {_LDIV_L} distinct). One row out: class
    counts, the row mass at risk, and the worst class size — the
    numbers a release gate thresholds on (q248's forget sweep is the
    remediation; this is the detector).

    Shape: one QI-key partial agg (the COUNT DISTINCT expands
    map-side), then a 1-row rollup. NULL QI values form their own
    class in both engines; NULL balances never count as a sensitive
    value (CASE inside the DISTINCT, pinned both sides)."""
    c = t(spark, sf_dir, "customer")
    band = F.when(
        F.col("c_acctbal").isNotNull(),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint"),
    )
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct(band).cast("bigint").alias("n_sensitive"),
    )
    below_k = F.when(F.col("class_size") < _KANON_K, 1).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.sum(below_k).cast("bigint").alias("n_classes_below_k"),
        F.sum(
            F.when(F.col("class_size") < _KANON_K, F.col("class_size"))
            .otherwise(0)
        ).cast("bigint").alias("n_rows_below_k"),
        F.sum(
            F.when(F.col("n_sensitive") < _LDIV_L, 1).otherwise(0)
        ).cast("bigint").alias("n_classes_below_l"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
    )


# --------------------------------------------------------------------------
# q267 — trimmed & winsorized price stats per priority (rank-exact)
# --------------------------------------------------------------------------

_TRIM_PCT = 5  # percent trimmed from EACH tail


@register(
    "q267_trimmed_price_stats",
    tags=("relational", "agg", "percentile", "robust", "histogram"),
    oracle=f"""
WITH pr AS (
  SELECT o_orderpriority,
         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS price_c
  FROM orders WHERE o_totalprice IS NOT NULL
),
hist AS (
  {sql_int_hist('pr', 'price_c', 'o_orderpriority')}
),
ranked AS (
  SELECT *,
         ({_TRIM_PCT} * n) // 100 AS lo,
         n - ({_TRIM_PCT} * n) // 100 AS hi
  FROM hist
),
stats AS (
  SELECT o_orderpriority,
         CAST(MAX(n) AS BIGINT) AS n_orders,
         CAST(MAX(hi - lo) AS BIGINT) AS n_kept,
         CAST(SUM(price_c * GREATEST(0, LEAST(cum, hi) - GREATEST(below, lo)))
              AS BIGINT) AS trimmed_sum_c,
         CAST(MIN(CASE WHEN cum >= lo + 1 THEN price_c END) AS BIGINT)
           AS v_lo_c,
         CAST(MIN(CASE WHEN cum >= hi THEN price_c END) AS BIGINT) AS v_hi_c,
         CAST(SUM(price_c * GREATEST(0, LEAST(cum, hi) - GREATEST(below, lo)))
              + MAX(lo) * MIN(CASE WHEN cum >= lo + 1 THEN price_c END)
              + MAX(n - hi) * MIN(CASE WHEN cum >= hi THEN price_c END)
              AS BIGINT) AS winsor_sum_c
  FROM ranked
  GROUP BY o_orderpriority
)
SELECT g.o_orderpriority, s.n_orders, s.n_kept, s.trimmed_sum_c,
       s.v_lo_c, s.v_hi_c, s.winsor_sum_c
FROM (SELECT DISTINCT o_orderpriority FROM orders) g
LEFT JOIN stats s
  ON s.o_orderpriority IS NOT DISTINCT FROM g.o_orderpriority
""",
)
def q267_trimmed_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust order-value accounting per priority: the {_TRIM_PCT}%-
    trimmed sum (drop the cheapest and dearest {_TRIM_PCT}% of orders —
    the mean a few mega-orders can't drag) and the winsorized sum
    (clamp the tails to the cut values instead of dropping them — the
    revenue-preserving variant), plus the cut prices themselves. The
    robust-stats sibling of q159's MAD and q106's Tukey fences.

    Rank-exact on the cents lattice (r8 int_hist discipline, never an
    interpolated double): kept ranks are (lo, hi] with lo = ⌊p·n/100⌋,
    hi = n − lo; a histogram row whose occupants span ranks
    (below, cum] contributes max(0, min(cum,hi) − max(below,lo))
    occupants to the trimmed sum — tie-runs split EXACTLY at the rank
    boundary, which no filter-by-value formulation can do. Cut values
    are at_rank order statistics; winsorized sum adds lo·v_lo +
    (n−hi)·v_hi. All integers end to end.

    Scale shape: one corpus-sized (priority, price_c) histogram
    exchange with map-side combine; the rank window and this aggregate
    run on the cents-domain-bounded histogram. Presence semantics: a
    priority whose prices are all NULL keeps its row (NULL stats) via
    the null-safe LEFT join from the distinct priority set — the
    q106/q159/q192 contract."""
    o = t(spark, sf_dir, "orders")
    pr = o.filter(F.col("o_totalprice").isNotNull()).select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("bigint")
        .alias("price_c"),
    )
    hist = int_hist(pr, "price_c", "o_orderpriority")
    ranked = hist.select(
        "*",
        F.expr(f"({_TRIM_PCT} * n) div 100").alias("lo"),
        F.expr(f"n - ({_TRIM_PCT} * n) div 100").alias("hi"),
    )
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("hi"))
        - F.greatest(F.col("below"), F.col("lo")),
    )
    v_lo = F.min(
        F.when(F.col("cum") >= F.col("lo") + 1, F.col("price_c"))
    )
    v_hi = F.min(F.when(F.col("cum") >= F.col("hi"), F.col("price_c")))
    tsum = F.sum(F.col("price_c") * kept)
    stats = ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.max(F.col("hi") - F.col("lo")).cast("bigint").alias("n_kept"),
        tsum.cast("bigint").alias("trimmed_sum_c"),
        v_lo.cast("bigint").alias("v_lo_c"),
        v_hi.cast("bigint").alias("v_hi_c"),
        (
            tsum
            + F.max("lo") * v_lo
            + F.max(F.col("n") - F.col("hi")) * v_hi
        )
        .cast("bigint")
        .alias("winsor_sum_c"),
    )
    groups = o.select("o_orderpriority").distinct()
    return groups.join(
        F.broadcast(stats.withColumnRenamed("o_orderpriority", "_prio")),
        groups["o_orderpriority"].eqNullSafe(F.col("_prio")),
        "left",
    ).select(
        "o_orderpriority",
        "n_orders",
        "n_kept",
        "trimmed_sum_c",
        "v_lo_c",
        "v_hi_c",
        "winsor_sum_c",
    )
