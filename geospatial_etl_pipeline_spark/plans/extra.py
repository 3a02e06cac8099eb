"""Second-wave operator coverage: pivot, SQL-API subqueries, exact
percentiles, sketches (rows-only), SimHash, multi-query kNN."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from ._util import (
    _SQL_EMB,
    at_rank,
    fan_out,
    int_hist,
    mq,
    msalt,
    qsum,
    sql_at_rank,
    sql_int_hist,
    sql_qsum,
    t,
    temb,
    temb_f,
)
from .catalog import register

_STATUSES = ["F", "O", "P"]


@register(
    "q26_pivot_status_by_priority",
    tags=("relational", "pivot"),
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS total_f
FROM orders
GROUP BY o_orderpriority
""",
)
def q26_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per order status (explicit value list so the
    plan needs no discovery pass — at scale, never let pivot infer its
    columns from the data)."""
    o = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(38,6)")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
            for s in _STATUSES
        ],
        F.coalesce(
            F.sum(F.when(F.col("o_orderstatus") == "F", dec)), F.lit(0).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("total_f"),
    )


@register(
    "q27_sql_api_in_subquery",
    tags=("relational", "sql-api", "subquery"),
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%'
)
AND c_acctbal > 5000.0
""",
)
def q27_sql_api_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point with an IN-subquery — the engine's SQL
    surface over registered temp views (Catalyst rewrites the subquery
    into a left-semi join)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer_v
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation_v WHERE n_name LIKE 'NATION_1%'
        )
        AND c_acctbal > 5000.0
        """
    )


@register(
    "q28_exact_percentiles",
    tags=("relational", "agg", "percentile"),
    oracle=f"""
WITH pr AS (
  SELECT o_orderpriority,
         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS price_c
  FROM orders WHERE o_totalprice IS NOT NULL
),
hist AS (
  {sql_int_hist('pr', 'price_c', 'o_orderpriority')}
),
pct AS (
  SELECT o_orderpriority,
         {sql_at_rank('price_c', 1, 2)} AS p50_c,
         {sql_at_rank('price_c', 9, 10)} AS p90_c,
         {sql_at_rank('price_c', 99, 100)} AS p99_c
  FROM hist
  GROUP BY o_orderpriority
)
SELECT g.o_orderpriority, p.p50_c, p.p90_c, p.p99_c
FROM (SELECT DISTINCT o_orderpriority FROM orders) g
LEFT JOIN pct p
  ON p.o_orderpriority IS NOT DISTINCT FROM g.o_orderpriority
""",
)
def q28_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-priority price percentiles as DISCRETE order
    statistics on the integer cents lattice: p_q is the smallest value
    whose cumulative count reaches rank ceil(q·n) — an element of the
    data, never an interpolation.

    r8 rewrite: the original emitted quantile_cont/percentile() doubles
    whose interpolation arithmetic is engine-version-dependent in the
    last ulp (the q166 driver red was exactly this class). Discrete
    rank selection over the (priority, price_c) int_hist is integer-
    exact end to end and — unlike interpolated percentile() — has a
    direct distributed form: the histogram agg partial-aggregates
    map-side, and the rank window runs per priority over the
    domain-bounded histogram, not the corpus. Presence semantics: a
    priority whose prices are all NULL keeps its row (NULL
    percentiles) via the null-safe LEFT join from the distinct
    priority set — the q106/q159/q192 contract. At 100 TB prefer
    q29's sketch variant for non-audit paths."""
    o = t(spark, sf_dir, "orders")
    pr = o.filter(F.col("o_totalprice").isNotNull()).select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("bigint")
        .alias("price_c"),
    )
    hist = int_hist(pr, "price_c", "o_orderpriority")
    pct = hist.groupBy("o_orderpriority").agg(
        at_rank("price_c", 1, 2).alias("p50_c"),
        at_rank("price_c", 9, 10).alias("p90_c"),
        at_rank("price_c", 99, 100).alias("p99_c"),
    )
    groups = o.select("o_orderpriority").distinct()
    return groups.join(
        F.broadcast(pct.withColumnRenamed("o_orderpriority", "_prio")),
        groups["o_orderpriority"].eqNullSafe(F.col("_prio")),
        "left",
    ).select("o_orderpriority", "p50_c", "p90_c", "p99_c")


@register(
    "q29_sketch_aggregates",
    tags=("relational", "agg", "sketch"),
    oracle=None,  # sketches are engine-specific -> driver rows-only check
)
def q29_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — HyperLogLog++ distinct counts and quantile
    sketches. Mergeable, fixed-size state: the ONLY percentile/distinct
    shapes that hold at 100 TB.

    No SQL oracle (sketch bits are engine-specific by construction),
    but NOT unfalsifiable: the same plan computes the exact answers
    next to the sketches and emits ``*_within_bound`` booleans checking
    each sketch against its published error — HLL++ rsd 0.05 (3σ band),
    percentile_approx rank error 1/accuracy (checked against the exact
    value window at q ± 5/accuracy). tests/test_catalog.py asserts every
    bound column is TRUE at two scales, so a broken sketch fails CI
    even though the driver's check is rows-only. The exact twins exist
    for verification; production callers use the sketch columns."""
    _RSD = 0.05
    _ACC = 1000
    _EPS = 5.0 / _ACC  # 5x the documented rank error: a real bound,
    #                    not a tautology, and immune to tie plateaus
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", _RSD).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.percentile_approx("o_totalprice", 0.5, _ACC).alias("approx_p50"),
        F.percentile_approx("o_totalprice", 0.99, _ACC).alias("approx_p99"),
        F.expr(
            f"percentile(o_totalprice, array({0.5 - _EPS}, {0.5 + _EPS},"
            f" {0.99 - _EPS}, 1.0))"
        ).alias("_pw"),
    )
    hll_err = (
        F.abs(F.col("approx_customers") - F.col("exact_customers"))
        / F.col("exact_customers")
    )
    return agg.select(
        "o_orderstatus",
        "approx_customers",
        "exact_customers",
        (hll_err <= 3 * _RSD).alias("hll_within_bound"),
        "approx_p50",
        (
            (F.col("approx_p50") >= F.element_at("_pw", 1))
            & (F.col("approx_p50") <= F.element_at("_pw", 2))
        ).alias("p50_within_bound"),
        "approx_p99",
        (
            (F.col("approx_p99") >= F.element_at("_pw", 3))
            & (F.col("approx_p99") <= F.element_at("_pw", 4))
        ).alias("p99_within_bound"),
    )


@register(
    "q44_simhash",
    tags=("dedup", "llm-data", "simhash"),
    oracle=r"""
WITH tok AS (
  SELECT doc_id, md5(text) AS tkey,
         unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tk
  FROM documents WHERE text IS NOT NULL
),
hashed AS (
  SELECT doc_id, tkey, ('0x' || substr(md5(tk), 1, 8))::BIGINT AS hv FROM tok
),
bits AS (
  SELECT doc_id, tkey, b.bit,
         SUM(CASE WHEN (hv >> b.bit::INT) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed, unnest(range(0, 32)) b(bit)
  GROUP BY doc_id, tkey, b.bit
),
sig AS (
  SELECT doc_id, tkey,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit::INT) ELSE 0 END)
              AS BIGINT) AS simhash32
  FROM bits
  GROUP BY doc_id, tkey
)
-- re-expand onto DOCUMENT ROWS: a bare GROUP BY doc_id would merge
-- duplicate-id rows' token sets into one chimera signature (and all
-- NULL-id rows into another) where the engine hashes each row — the
-- dup/NULL-id probe caught exactly that divergence
SELECT d.doc_id, s.simhash32
FROM documents d
JOIN sig s ON s.doc_id IS NOT DISTINCT FROM d.doc_id
          AND s.tkey = md5(d.text)
WHERE d.text IS NOT NULL
""",
)
def q44_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over distinct tokens: bit j is the sign of the sum
    of ±1 votes from each token's hash bit j. Near-duplicate docs land
    within small Hamming distance.

    The whole signature folds IN-ROW in ONE pass: hash the distinct
    tokens into an array, then a single aggregate over the tokens
    carries ALL 32 vote counters as an array accumulator
    (zip_with(acc, bits)), and a final zip_with turns counter signs
    into bits (order-free integer votes, engine-exact) — zero shuffles.
    The previous form ran 32 separate per-bit folds over the token
    array: identical arithmetic, but 32 interpreted higher-order passes
    instead of 1 — measured 3.0 s → 0.4 s at sf0.1 (the md5 hashing
    itself is only ~0.25 s). The round-1 explode×bits + two hash-aggs
    version was worse still (shuffled 32× the token count)."""
    # NULL-text docs are ABSENT from the output in both engines: the
    # oracle's unnest(NULL tokens) naturally drops the doc; Spark's
    # in-row fold would emit a degenerate all-(-1)-votes row without
    # this scan-level prefilter (hostile-input sweep finding).
    # fan_out AFTER projecting to the two columns this query reads and
    # after the null prefilter, so the exchange neither hashes nor
    # carries dead bytes (r12, guide §2.3 "project before the exchange";
    # the xxhash64 partitioning key references every input column, so
    # Catalyst can never prune below it on its own)
    d = fan_out(
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
    )
    staged = d.select("doc_id", tokens("text").alias("_tok")).select(
        "doc_id",
        F.expr(
            "transform(array_distinct(_tok), "
            "tk -> CAST(conv(substring(md5(tk), 1, 8), 16, 10) AS BIGINT))"
        ).alias("_hvs"),
    )
    simhash = F.expr(
        "aggregate("
        "  zip_with("
        "    aggregate(_hvs, transform(sequence(0, 31), j -> CAST(0 AS BIGINT)),"
        "      (acc, h) -> zip_with(acc, sequence(0, 31),"
        "        (a, j) -> a + IF(((h >> j) & 1) = 1,"
        "                         CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))),"
        "    sequence(0, 31),"
        "    (s, j) -> IF(s > 0, shiftleft(CAST(1 AS BIGINT), j),"
        "                 CAST(0 AS BIGINT))),"
        "  CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    return staged.select("doc_id", simhash.cast("bigint").alias("simhash32"))


@register(
    "q53_knn_topk_multi_query",
    tags=("similarity", "llm-data", "topk"),
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM {_SQL_EMB} embeddings WHERE vec_id < 5),
e AS (SELECT vec_id, embedding FROM {_SQL_EMB} embeddings),
prod AS (
  SELECT q.query_id, e.vec_id,
         e.embedding[i::INT]::DOUBLE AS x, qv[i::INT]::DOUBLE AS y
  FROM e, q, unnest(range(1, len(e.embedding) + 1)) t(i)
  WHERE e.vec_id <> q.query_id
),
agg AS (
  SELECT query_id, vec_id,
         CAST({sql_qsum('x * y')} AS DOUBLE) / 1e12 AS dot,
         CAST({sql_qsum('x * x')} AS DOUBLE) / 1e12 AS na,
         CAST({sql_qsum('y * y')} AS DOUBLE) / 1e12 AS nq
  FROM prod GROUP BY query_id, vec_id
),
ranked AS (
  SELECT query_id, vec_id,
         dot / (sqrt(na) * sqrt(nq)) AS cosine_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC
         ) AS INT) AS rn
  FROM agg
)
SELECT query_id, vec_id, cosine_sim, rn FROM ranked WHERE rn <= 3
""",
)
def q53_knn_topk_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN for a query SET (5 vectors × corpus, top-3 each): broadcast
    queries, zip_with integer-fold dots inside each row (no explode, no
    aggregation shuffle — integer sums are order-free so the fold equals
    the oracle's explode+SUM), per-query window top-k. The same plan
    shape the brute-force arm of operators.similarity uses — this is
    its oracle-checked twin."""
    from .similarity import _qdot

    # self-norms staged per ROW below the broadcast join (r12 — the
    # q224 fix): per-pair they re-ran the O(d) fold twice per pair for
    # |corpus| distinct values.  Same expression, same rows, same bits;
    # the oracle's per-pair GROUP BY yields the identical value.
    e = temb_f(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).select(
        "vec_id", "v",
        (_qdot(F.col("v"), F.col("v")).cast("double") / F.lit(1e12)).alias("na"),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("na").alias("nq"),
    )
    agg = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            (_qdot(F.col("v"), F.col("qv")).cast("double") / F.lit(1e12)).alias("dot"),
            "na",
            "nq",
        )
    )
    sim = agg.select(
        "query_id", "vec_id",
        (F.col("dot") / (F.sqrt("na") * F.sqrt("nq"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        sim.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q17_grouping_sets",
    tags=("relational", "agg", "grouping-sets"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
HAVING COUNT(*) > 0
""",
)
def q17_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer-grained than rollup/cube) through
    the SQL surface. Empty-input contract pinned as in q15 (HAVING
    COUNT(*) > 0 — oracle-side no-op on any non-empty input)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q18_unpivot_part_metrics",
    tags=("relational", "unpivot"),
    oracle="""
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
""",
)
def q18_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): one row per (part, metric)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@register(
    "q19_array_agg_topn",
    tags=("relational", "agg", "array"),
    oracle="""
SELECT c_nationkey,
       COALESCE(array_to_string(
         list_transform(
           (list(c_acctbal ORDER BY c_acctbal DESC, c_custkey ASC)
              FILTER (c_acctbal IS NOT NULL))[1:3],
           x -> printf('%.2f', x)),
         '|'), '') AS top3_bal,
       CAST(COUNT(*) AS INT) AS n_customers
FROM customer
GROUP BY c_nationkey
""",
)
def q19_array_agg_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation + slicing: top-3 balances per nation.
    collect_list carries (balance, custkey) structs so the sort is
    total-ordered, then slices and projects. The slice is emitted as a
    canonical '|'-joined %.2f string (not ARRAY<DOUBLE>) so external
    hash-based comparators can digest the cell; balances are 2-decimal
    currency, so %.2f is an exact round-trip of the stored double.

    NULL balances are excluded from the top-3 STRING in both engines
    (explicit FILTER in the oracle, a when-guard here — without it
    Spark's format_string renders NULL as the literal string 'null'
    while DuckDB's printf propagates NULL: hostile-dim probe);
    n_customers counts ROWS, NULL balance or not."""
    c = t(spark, sf_dir, "customer")
    pairs = F.collect_list(
        F.when(
            F.col("c_acctbal").isNotNull(),
            F.struct(F.col("c_acctbal"), F.col("c_custkey")),
        )
    )
    # sort structs by (acctbal DESC, custkey ASC): negate both fields
    sorted_bals = F.transform(
        F.slice(
            F.reverse(F.array_sort(
                F.transform(pairs, lambda s: F.struct(
                    s["c_acctbal"].alias("b"), (-s["c_custkey"]).alias("k")
                ))
            )),
            1, 3,
        ),
        lambda s: s["b"],
    )
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(sorted_bals, lambda b: F.format_string("%.2f", b)), "|"
        ).alias("top3_bal"),
        F.count(F.lit(1)).cast("int").alias("n_customers"),
    )


@register(
    "q45_correlated_subquery",
    tags=("relational", "subquery", "sql-api"),
    oracle="""
SELECT c.c_custkey, c.c_acctbal, c.c_nationkey
FROM customer c
WHERE 2 * CAST(FLOOR(c.c_acctbal * 100.0) AS BIGINT)
        * (SELECT COUNT(*) FROM customer c2
           WHERE c2.c_nationkey = c.c_nationkey)
    > 3 * (SELECT SUM(CAST(FLOOR(c2.c_acctbal * 100.0) AS BIGINT))
           FROM customer c2
           WHERE c2.c_nationkey = c.c_nationkey)
""",
)
def q45_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (decorrelated by Catalyst into an
    aggregate + join): customers 1.5x above their nation's mean balance.

    The predicate is INTEGER-exact (r9 ULP-canary audit): the textbook
    ``bal > AVG(bal) * 1.5`` compares against a raw-double average whose
    summation order differs between engines — a balance within a few
    ulps of the boundary could flip membership under a different engine
    version (the q166 lesson, applied to predicates). Rewritten as
    ``2 * cents(bal) * n > 3 * SUM(cents(bal))`` — the same inequality
    cleared of the division and the 1.5 literal, all int64 cents
    (|cents| <= 1e6, n per nation <= ~4e10 before the product nears
    2^63; the oracle's SUM side promotes to HUGEINT and is exact
    regardless). Two correlated scalar subqueries instead of one —
    Catalyst decorrelates both into the same aggregate-join shape
    (TPC-H Q17/Q22 style), so the surface this query exists to cover
    widens rather than narrows."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v2")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal, c.c_nationkey
        FROM customer_v2 c
        WHERE 2 * CAST(FLOOR(c.c_acctbal * 100.0) AS BIGINT)
                * (SELECT COUNT(*) FROM customer_v2 c2
                   WHERE c2.c_nationkey = c.c_nationkey)
            > 3 * (SELECT SUM(CAST(FLOOR(c2.c_acctbal * 100.0) AS BIGINT))
                   FROM customer_v2 c2
                   WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "q34_rank_functions",
    tags=("window", "rank"),
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       percent_rank() OVER w AS prnk,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       cume_dist() OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def q34_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function suite (SURVEY §2e): rank, dense_rank,
    percent_rank, ntile, cume_dist per market segment ordered by account
    balance. One window spec -> one shuffle on the partition key; the
    total order (tiebreak on c_custkey) makes every rank deterministic."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "q35_full_outer_join",
    tags=("join", "outer"),
    oracle="""
WITH big_cust AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 9000
),
big_orders AS (
  SELECT o_custkey, COUNT(*) AS n_big_orders
  FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
)
SELECT COALESCE(bc.c_custkey, bo.o_custkey) AS custkey,
       bc.c_name,
       CAST(bc.c_acctbal AS DOUBLE) AS acctbal,
       bo.n_big_orders
FROM big_cust bc
FULL OUTER JOIN big_orders bo ON bc.c_custkey = bo.o_custkey
""",
)
def q35_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (SURVEY §2c [EXT]): rich customers vs customers
    with big orders — rows survive from BOTH unmatched sides. Sort-merge
    full-outer on the key; both sides pre-filtered so the shuffle carries
    only qualifying rows (filters pushed to the parquet scans)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    big_cust = c.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    big_orders = (
        o.filter(F.col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    joined = big_cust.join(
        big_orders, big_cust.c_custkey == big_orders.o_custkey, "full_outer"
    )
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        "n_big_orders",
    )


@register(
    "q36_salted_skew_join",
    tags=("join", "skew", "scale"),
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       CAST(l.l_quantity AS DOUBLE) AS quantity,
       o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 150000
""",
)
def q36_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join operator under the correctness gate: lineitem ⋈
    orders through operators.skew.salted_join (8 salts), oracle'd by the
    PLAIN SQL join — salting must be a pure physical rewrite with zero
    semantic footprint. At 100 TB this is the pre-emptive answer to hot
    order keys that AQE can only split after observing them."""
    from ..operators.skew import salted_join

    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    return salted_join(l, o, ["l_orderkey"], n_salts=8).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        "o_orderpriority",
    )


@register(
    "q109_table_profile",
    tags=("relational", "profiling", "quality"),
    oracle="""
SELECT 'l_quantity' AS col,
       COUNT(*) AS n_rows,
       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*),
       CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
       CAST(COUNT(DISTINCT l_discount) AS BIGINT),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_tax', COUNT(*),
       CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
       CAST(COUNT(DISTINCT l_tax) AS BIGINT),
       CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
FROM lineitem
""",
)
def q109_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling census (the ingest health check every pipeline
    runs before trusting a table): rows, nulls, exact distincts,
    min/max per profiled column, one row per column.

    Shape: ONE scan feeds all three column profiles (Catalyst shares
    the relation; count-distinct expands per column). min/max/count are
    order-free so no decimal summation is needed. At 100 TB swap exact
    count-distinct for approx_count_distinct per the q29 sketch
    contract — the plan shape is unchanged."""
    li = t(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).cast("bigint").alias("n_null"),
            F.count_distinct(F.col(col)).cast("bigint").alias("n_distinct"),
            F.min(col).cast("double").alias("min_v"),
            F.max(col).cast("double").alias("max_v"),
        )

    out = profile("l_quantity")
    for c in ("l_discount", "l_tax"):
        out = out.unionByName(profile(c))
    return out


@register(
    "q110_referential_integrity",
    tags=("relational", "quality", "anti-join", "fk-audit"),
    oracle="""
SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
""",
)
def q110_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for each foreign-key edge (lineitem→orders, orders→customer,
    customer→nation) via anti joins — the constraint check a lakehouse
    must run itself because parquet enforces nothing.

    Scale shape: each edge is a LEFT ANTI equi-join on the key with the
    parent side projected to its key column only; the dimension-sized
    parents (customer, nation) broadcast, the fact-fact edge shuffles
    on the join key with AQE. Zero-orphan results are the expected
    steady state — the query is the proof, not the alarm."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey")

    def audit(child: DataFrame, parent: DataFrame, on, name: str) -> DataFrame:
        return (
            child.join(parent, on, "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        audit(li, o.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "lineitem->orders")
        .unionByName(
            audit(o.select("o_custkey"), F.broadcast(c.select("c_custkey")),
                  F.col("o_custkey") == F.col("c_custkey"), "orders->customer"))
        .unionByName(
            audit(c.select("c_nationkey"), F.broadcast(n),
                  F.col("c_nationkey") == F.col("n_nationkey"),
                  "customer->nation"))
    )


_CM_D = 3  # count-min depth (independent hash rows)
_CM_W = 64  # count-min width (buckets per row)
_CM_TOPK = 10


def cm_bucket(i_col, uid_col, width: int = _CM_W):
    """Count-min hash row: first 32 md5 bits of ('cm:' i ':' key) mod
    width — shared by the batch build (q132), its probe, and the
    streaming accumulator (streaming/events.streaming_count_min), so
    the three can never drift onto different sketches."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cm:"),
                    i_col.cast("string"),
                    F.lit(":"),
                    uid_col.cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint") % width


@register(
    "q132_count_min_heavy_hitters",
    tags=("sketch", "llm-data", "heavy-hitters"),
    oracle=f"""
WITH cm AS (
  SELECT i,
         ('0x' || substr(md5('cm:' || CAST(i AS VARCHAR) || ':'
            || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % {_CM_W} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events, unnest([0, 1, 2]) t(i)
  GROUP BY 1, 2
),
true_top AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY user_id
  ORDER BY true_cnt DESC, user_id ASC LIMIT {_CM_TOPK}
),
probe AS (
  SELECT tt.user_id, tt.true_cnt, u.i,
         ('0x' || substr(md5('cm:' || CAST(u.i AS VARCHAR) || ':'
            || CAST(tt.user_id AS VARCHAR)), 1, 8))::BIGINT % {_CM_W}
           AS bucket
  FROM true_top tt, unnest([0, 1, 2]) u(i)
)
SELECT p.user_id, p.true_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS cm_estimate
FROM probe p JOIN cm c ON c.i = p.i AND c.bucket = p.bucket
GROUP BY p.user_id, p.true_cnt
""",
)
def q132_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch made falsifiable: build a ({_CM_D} x {_CM_W})
    CM table over event user_ids with md5-derived hash rows, then
    estimate the true top-{_CM_TOPK} users' counts from the sketch —
    est = min over rows of the hashed bucket's counter. The structural
    guarantee est >= true_cnt is pinned in tests; the whole build+probe
    is exact integers, so unlike q29's engine-native sketches this one
    value-hashes cross-engine.

    Scale shape: the build is ONE map-side-combined aggregate whose
    output is {_CM_D}*{_CM_W} rows no matter the corpus (the in-row
    explode adds {_CM_D} rows per event BEFORE partial agg collapses
    them); the probe joins the top-k (TakeOrdered) against the
    broadcast-sized sketch. This is the streaming-accumulator shape a
    100 TB pipeline uses when exact per-key counts can't fit."""
    e = t(spark, sf_dir, "events")
    bucket = cm_bucket

    rows = e.select(
        "user_id", F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("i")
    )
    cm = (
        rows.select("i", bucket(F.col("i"), F.col("user_id")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    true_top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("user_id").asc())
        .limit(_CM_TOPK)
    )
    probe = true_top.select(
        "user_id",
        "true_cnt",
        F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("i"),
    ).select(
        "user_id",
        "true_cnt",
        "i",
        bucket(F.col("i"), F.col("user_id")).alias("bucket"),
    )
    return (
        probe.join(F.broadcast(cm), ["i", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


_BLOOM_M = 1024  # bloom bit-array size
_BLOOM_K = 4  # hash functions


@register(
    "q133_bloom_prefilter_audit",
    tags=("sketch", "llm-data", "bloom", "dedup"),
    oracle=f"""
WITH hist AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fp
  FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
),
bits AS (
  SELECT list(DISTINCT
           ('0x' || substr(md5('bloom:' || CAST(j AS VARCHAR) || ':' || fp),
                           1, 8))::BIGINT % {_BLOOM_M}) AS bs
  FROM hist, unnest([0, 1, 2, 3]) t(j)
),
inc AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp
  FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL
)
SELECT i.doc_id,
       CASE WHEN list_has_all(b.bs,
              list_transform([0, 1, 2, 3],
                j -> ('0x' || substr(md5('bloom:' || CAST(j AS VARCHAR)
                      || ':' || i.fp), 1, 8))::BIGINT % {_BLOOM_M}))
            THEN 1 ELSE 0 END AS bloom_hit,
       CASE WHEN h.fp IS NULL THEN 0 ELSE 1 END AS exact_dup
FROM inc i
LEFT JOIN hist h ON h.fp = i.fp, bits b
""",
)
def q133_bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filter audit for incremental dedup (q77's companion):
    build a {_BLOOM_M}-bit / {_BLOOM_K}-hash bloom over the historical
    corpus' content fingerprints, probe every incoming doc, and emit
    the bloom verdict NEXT TO exact membership — so the false-positive
    rate (bloom_hit=1, exact_dup=0) is measured, not assumed, and the
    no-false-negative guarantee is a pinned test invariant.

    Scale shape: the bit set is a distinct-agg whose output is <=
    {_BLOOM_M} integers regardless of corpus size -> one broadcast
    array; probing is {_BLOOM_K} in-row md5s + array_contains, entirely
    map-side. The exact side stays a fingerprint-keyed join — at 100 TB
    you'd let the bloom PRUNE that join's probe side first (the bloom
    column is computed before the shuffle), which is precisely what
    AQE's runtime filter automates for q77.

    NULL-text docs are excluded on BOTH sides (explicit WHERE): a doc
    with no fingerprint can be neither bloom member nor probe — left
    implicit, DuckDB's list_has_all over a NULL probe list goes
    vacuously true while Spark's NULL-fold goes false (hostile-input
    sweep finding)."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = F.md5(F.lower(F.trim(F.col("text"))))

    def bbucket(j: int, fp_col):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom:{j}:"), fp_col)), 1, 8
            ),
            16,
            10,
        ).cast("bigint") % _BLOOM_M

    hist = d.filter(F.col("doc_id") % 2 == 0).select(fp.alias("fp")).distinct()
    bits = hist.select(
        F.explode(
            F.array(*[bbucket(j, F.col("fp")) for j in range(_BLOOM_K)])
        ).alias("b")
    ).agg(F.collect_set("b").alias("bs"))
    inc = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", fp.alias("fp"))
    probed = inc.crossJoin(F.broadcast(bits)).select(
        "doc_id",
        "fp",
        F.when(
            (
                sum(
                    F.array_contains(F.col("bs"), bbucket(j, F.col("fp"))).cast(
                        "int"
                    )
                    for j in range(_BLOOM_K)
                )
                == _BLOOM_K
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("bloom_hit"),
    )
    return (
        probed.join(
            hist.withColumnRenamed("fp", "hfp"),
            F.col("fp") == F.col("hfp"),
            "left",
        )
        .select(
            "doc_id",
            "bloom_hit",
            F.when(F.col("hfp").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("exact_dup"),
        )
    )


_MB_MIN_CO = 2
_MB_TOPK = 50
_MB_Q = 10**6  # lift quantization


@register(
    "q134_part_pair_lift",
    tags=("relational", "mining", "co-occurrence"),
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li),
pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS pcnt FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS co
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MB_MIN_CO}
),
scored AS (
  SELECT p.part_a, p.part_b, p.co,
         CAST(floor({float(_MB_Q)!r}
              * (CAST(p.co * n.n_orders AS DOUBLE)
                 / CAST(ca.pcnt * cb.pcnt AS DOUBLE))) AS BIGINT) AS lift_q
  FROM pairs p
  JOIN pc ca ON ca.l_partkey = p.part_a
  JOIN pc cb ON cb.l_partkey = p.part_b, n
)
SELECT part_a, part_b, co, lift_q, CAST(rn AS INT) AS rn FROM (
  SELECT *, row_number() OVER (
    ORDER BY lift_q DESC, part_a ASC, part_b ASC) AS rn
  FROM scored
) WHERE rn <= {_MB_TOPK}
""",
)
def q134_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining over order lines: the
    top-{_MB_TOPK} part pairs by LIFT (P(a,b) / P(a)P(b)), support
    >= {_MB_MIN_CO} orders — the association-rule primitive behind
    recommendation candidates and (on a corpus) phrase collocation.

    Determinism: support counts, part frequencies and the order total
    are BIGINTs; lift is one scalar double ratio floor-quantized to
    lift_q, so ranking ties are integer-exact and the top-k tie-break
    is (lift_q, part_a, part_b).

    Scale shape: the per-order distinct projection bounds the pair
    fan-out at C(lines_per_order, 2) per order — a per-group quadratic
    like q121's clusters, bounded by the basket size, never corpus².
    The self-join keys on l_orderkey (both sides the SAME exchange);
    part frequencies broadcast back onto the pair relation (the part
    dim is the small side), so the pair relation shuffles once for its
    own aggregation and once for the global top-k."""
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.select(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("pcnt"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _MB_MIN_CO)
    )
    ca = pc.select(
        F.col("l_partkey").alias("part_a"), F.col("pcnt").alias("ca")
    )
    cb = pc.select(
        F.col("l_partkey").alias("part_b"), F.col("pcnt").alias("cb")
    )
    scored = (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "co",
            F.floor(
                F.lit(float(_MB_Q))
                * (
                    (F.col("co") * F.col("n_orders")).cast("double")
                    / (F.col("ca") * F.col("cb")).cast("double")
                )
            )
            .cast("bigint")
            .alias("lift_q"),
        )
    )
    # TakeOrdered FIRST (partial top-k, no single-partition shuffle of
    # the full pair relation), then rank the k survivors — the global
    # row_number window only ever sees _MB_TOPK rows.
    order = [
        F.col("lift_q").desc(),
        F.col("part_a").asc(),
        F.col("part_b").asc(),
    ]
    top = scored.orderBy(*order).limit(_MB_TOPK)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w).cast("int"))


_SKEW_TOPK = 5
_SKEW_Q = 10**6


@register(
    "q138_join_key_skew_report",
    tags=("profiling", "skew", "llm-data"),
    oracle=f"""
WITH per AS (
  SELECT 'lineitem' AS relation, 'l_orderkey' AS keycol,
         CAST(l_orderkey AS VARCHAR) AS key, COUNT(*) AS cnt
  FROM lineitem GROUP BY 3
  UNION ALL
  SELECT 'lineitem', 'l_partkey', CAST(l_partkey AS VARCHAR), COUNT(*)
  FROM lineitem GROUP BY 3
  UNION ALL
  SELECT 'events', 'user_id', CAST(user_id AS VARCHAR), COUNT(*)
  FROM events GROUP BY 3
),
tot AS (
  SELECT relation, keycol, CAST(SUM(cnt) AS BIGINT) AS total
  FROM per GROUP BY 1, 2
)
SELECT relation, keycol, key, cnt, share_q, CAST(rn AS INT) AS rn FROM (
  SELECT p.relation, p.keycol, p.key, CAST(p.cnt AS BIGINT) AS cnt,
         CAST(floor({float(_SKEW_Q)!r} * CAST(p.cnt AS DOUBLE) / t.total)
              AS BIGINT) AS share_q,
         row_number() OVER (PARTITION BY p.relation, p.keycol
                            ORDER BY p.cnt DESC, p.key ASC) AS rn
  FROM per p JOIN tot t
    ON t.relation = p.relation AND t.keycol = p.keycol
) WHERE rn <= {_SKEW_TOPK}
""",
)
def q138_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew census: the top-{_SKEW_TOPK} heaviest keys and
    their corpus share for each join column the engine shuffles on —
    the diagnostic you run BEFORE picking salting factors
    (operators/skew.py) or AQE skew thresholds at 100 TB, kin to the
    q109 column census.

    Scale shape: one map-side-combined count agg per audited column
    (the only data-sized exchanges), per-column totals from those tiny
    aggregates, broadcast back; the per-column top-k is a window over
    |distinct keys| already reduced rows. Adding a column to the audit
    adds one scan+agg, nothing quadratic."""

    def top_keys(df: DataFrame, relation: str, keycol: str) -> DataFrame:
        per = (
            df.select(F.col(keycol).cast("string").alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        tot = per.agg(F.sum("cnt").alias("total"))
        w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
        return (
            per.orderBy(F.col("cnt").desc(), F.col("key").asc())
            .limit(_SKEW_TOPK)
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(relation).alias("relation"),
                F.lit(keycol).alias("keycol"),
                "key",
                F.col("cnt").cast("bigint").alias("cnt"),
                F.floor(
                    F.lit(float(_SKEW_Q))
                    * F.col("cnt").cast("double")
                    / F.col("total")
                )
                .cast("bigint")
                .alias("share_q"),
                F.row_number().over(w).cast("int").alias("rn"),
            )
        )

    li = t(spark, sf_dir, "lineitem")
    ev = t(spark, sf_dir, "events")
    return (
        top_keys(li, "lineitem", "l_orderkey")
        .unionByName(top_keys(li, "lineitem", "l_partkey"))
        .unionByName(top_keys(ev, "events", "user_id"))
    )


_EQUIDEPTH_BUCKETS = 16


@register(
    "q158_equidepth_histogram",
    tags=("relational", "agg", "percentile", "histogram"),
    oracle=f"""
WITH pr AS (
  SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS price_c
  FROM orders WHERE o_totalprice IS NOT NULL
),
hist AS (
  {sql_int_hist('pr', 'price_c')}
)
SELECT CAST(({_EQUIDEPTH_BUCKETS} * below) // n AS INT) AS bucket,
       CAST(SUM(cnt) AS BIGINT) AS n_orders,
       MIN(price_c) AS lo_c,
       MAX(price_c) AS hi_c,
       CAST(SUM(price_c * cnt) AS BIGINT) AS sum_price_c
FROM hist
GROUP BY CAST(({_EQUIDEPTH_BUCKETS} * below) // n AS INT)
""",
)
def q158_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order totals — the
    optimizer-statistics primitive (selectivity estimation, skew
    detection) and the binning step before quantile-bucketed feature
    encoding. {_EQUIDEPTH_BUCKETS} buckets on the integer cents
    lattice.

    r8 rewrite (q166's de-float applied to the whole family): the old
    form bucketed on interpolated percentile() boundaries — the
    engine-version ulp hazard. Now prices quantize by FLOOR(x·100)
    (one IEEE multiply + floor, bit-identical across engines even for
    off-lattice doubles), the bucket is the exact rank expression
    ({_EQUIDEPTH_BUCKETS}·below) DIV n over the price int_hist, and
    all outputs (populations, cents range, cents mass) come from the
    histogram itself. Rows tied on price share `below`, so they land
    in one bucket deterministically — populations deviate from
    n/{_EQUIDEPTH_BUCKETS} exactly at ties, the documented semantics.

    Still deliberately NOT ntile() on the corpus: the only corpus-
    sized stage is the map-side-combined histogram agg; the global
    rank window then sorts the HISTOGRAM — bounded by the cents
    DOMAIN (~5e7 rows for any corpus), not the row count. At 100 TB
    the same histogram feeds approx boundaries if even that sort is
    unwanted (SCALING.md)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    pr = o.select(
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("bigint")
        .alias("price_c")
    )
    hist = int_hist(pr, "price_c")
    bucket = F.expr(f"CAST(({_EQUIDEPTH_BUCKETS} * below) div n AS INT)")
    return hist.groupBy(bucket.alias("bucket")).agg(
        F.sum("cnt").cast("bigint").alias("n_orders"),
        F.min("price_c").alias("lo_c"),
        F.max("price_c").alias("hi_c"),
        F.sum(F.col("price_c") * F.col("cnt"))
        .cast("bigint")
        .alias("sum_price_c"),
    )


# ---- q208: Pareto frontier (skyline) -------------------------------------


@register(
    "q208_skyline_pareto",
    tags=("skyline", "window", "part"),
    oracle="""
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice IS NOT NULL AND q.p_size IS NOT NULL
      AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
  )
""",
)
def q208_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator: the parts not dominated on
    (minimize retail price, maximize size) — the multi-objective
    shortlist primitive (BNL/SFS skyline literature). A part is
    dominated by any part at most as expensive with at least its size,
    strictly better on one axis; equal-(price, size) points co-survive.

    Plan: collapse to the per-price max size (one partial agg — the
    only relation the ordered pass ever sees), running max over
    strictly cheaper prices (window, 1-row lag frame), keep prices
    whose max size strictly exceeds it, then semi-join the survivors
    back to rows on (price, size = price-group max). The ordered window
    runs on the per-PRICE aggregate (bounded domain — cents-quantized
    prices), not the row relation, so the sort input at 100 TB is the
    price histogram, not the table; the skyline is also
    union-mergeable (skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B))) for partition-local pre-filtering. The oracle states
    the quadratic NOT-EXISTS domination spec — a deliberately different
    algorithm, so a shared-formula bug cannot hide."""
    p = t(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
    )
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("msize")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_prices = per_price.select(
        "p_retailprice",
        "msize",
        F.max("msize").over(w).alias("prevmax"),
    ).filter(F.col("prevmax").isNull() | (F.col("msize") > F.col("prevmax")))
    return p.join(
        F.broadcast(frontier_prices),
        (p.p_retailprice == frontier_prices.p_retailprice)
        & (p.p_size == frontier_prices.msize),
        "leftsemi",
    ).select("p_partkey", "p_retailprice", "p_size")


# ---- q211: small-file compaction planner ---------------------------------

_COMPACT_TARGET = 2000  # target chars per compaction group


@register(
    "q211_compaction_planner",
    tags=("maintenance", "window", "documents"),
    oracle=f"""
WITH f AS (
  -- NULLS FIRST + size tie-break pinned: duplicate ids with different
  -- sizes tie on doc_id alone (order-dependent running sum), and a
  -- NULL id orders first in Spark windows, last in DuckDB
  -- (dup/NULL-id fixture)
  SELECT source, doc_id, COALESCE(n_chars, 0) AS sz,
         COALESCE(SUM(COALESCE(n_chars, 0)) OVER (
           PARTITION BY source
           ORDER BY doc_id ASC NULLS FIRST, COALESCE(n_chars, 0) ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents
)
SELECT source,
       CAST(cum_before // {_COMPACT_TARGET} AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sz) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM f
GROUP BY source, group_id
""",
)
def q211_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the table-maintenance pass every
    100 TB lakehouse runs: within each source partition, files (docs
    stand in, n_chars = size) are packed in id order into target-size
    output groups by bucketing the RUNNING size-before-me at the target
    (first-fit-in-order bin packing; a file larger than the target gets
    its own group and the next group starts fresh past it). Output is
    the compaction manifest: per (source, group) the file count, byte
    total and id span a rewrite job needs.

    Shape: one window cumsum per source partition (ordered by the
    unique file id — deterministic), one agg on the derived group key;
    both share the source-hash shuffle. Exact integer arithmetic end to
    end. At scale the plan is per-partition independent — exactly how
    Delta/Iceberg OPTIMIZE schedules bin-packing per partition."""
    d = t(spark, sf_dir, "documents")
    sz = F.coalesce(F.col("n_chars"), F.lit(0))
    # NULLS FIRST + size tie-break: see oracle comment
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc_nulls_first(), sz.asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = d.select(
        "source",
        "doc_id",
        sz.alias("sz"),
        F.coalesce(F.sum(sz).over(w), F.lit(0)).alias("cum_before"),
    )
    gid = F.floor(F.col("cum_before") / F.lit(_COMPACT_TARGET)).cast("bigint")
    return f.groupBy("source", gid.alias("group_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("sz").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


# ---- q212: mergeable partition statistics --------------------------------


@register(
    "q212_partition_stats_merge",
    tags=("profiling", "agg", "documents"),
    oracle="""
WITH s AS (
  SELECT source, COUNT(n_chars) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s1,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY source
),
u AS (
  SELECT source, n, s1, s2 FROM s
  UNION ALL
  SELECT '__ALL__', CAST(COUNT(n_chars) AS BIGINT),
         CAST(SUM(n_chars) AS BIGINT),
         CAST(SUM(n_chars * n_chars) AS BIGINT)
  FROM documents
)
SELECT source, CAST(n AS BIGINT) AS n,
       s1 AS sum_chars, s2 AS sumsq_chars,
       s1 / CAST(n AS DOUBLE) AS mean_chars,
       (n * s2 - s1 * s1) / CAST(n AS DOUBLE) / n AS var_pop_chars
FROM u WHERE n > 0
""",
)
def q212_partition_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partition statistics — the profile pattern that makes
    100 TB table stats O(partitions): each partition contributes exact
    integer power sums (n, Σx, Σx²); any union of partitions merges by
    ADDING them; mean and population variance derive at read time as
    (nΣx² − (Σx)²)/n². The global '__ALL__' row here is computed BY
    MERGING the per-source sums — never re-reading rows — while the
    oracle derives it directly from the raw table, so the hash check
    certifies the merge algebra itself, not just the formulas.

    Bounds: n_chars < 10⁴, so Σx² < 10⁸·rows — a 10¹⁰-row partition
    stays within int64; beyond that the sums go DECIMAL(38,0) with the
    same algebra. Divisions happen once per output row on identical
    integers → identical doubles."""
    d = t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("n_chars").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    merged = per.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1").cast("bigint").alias("s1"),
        F.sum("s2").cast("bigint").alias("s2"),
    ).select(F.lit("__ALL__").alias("source"), "n", "s1", "s2")
    u = per.select("source", "n", "s1", "s2").unionByName(merged)
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    return u.filter(n > 0).select(
        "source",
        n.cast("bigint").alias("n"),
        s1.alias("sum_chars"),
        s2.alias("sumsq_chars"),
        (s1 / n.cast("double")).alias("mean_chars"),
        ((n * s2 - s1 * s1) / n.cast("double") / n).alias("var_pop_chars"),
    )


# ---- q214: order-independent table checksum ------------------------------

# Canonical row representation: every column is rendered through an
# engine-invariant encoding (integers and quantized money as decimal
# strings, timestamps as integer epoch-micros, strings verbatim) with a
# per-column NULL sentinel — doubles NEVER go straight to string (the
# engines format them differently), and coalesce markers keep NULL from
# aliasing with ''.
# The trailing null bitmap makes the encoding injective: without it a
# literal '#N' value would hash identically to a NULL field, so two
# tables differing only by NULL<->'#N' would reconcile as "in sync".
_CK_SQL_REPR = (
    "concat_ws('|',"
    " COALESCE(CAST(o_orderkey AS VARCHAR), '#N'),"
    " COALESCE(CAST(o_custkey AS VARCHAR), '#N'),"
    " COALESCE(CAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), '#N'),"
    " COALESCE(CAST(epoch_us(o_orderdate) AS VARCHAR), '#N'),"
    " COALESCE(o_orderstatus, '#N'),"
    " COALESCE(o_orderpriority, '#N'),"
    " concat(CAST(o_orderkey IS NULL AS INT), CAST(o_custkey IS NULL AS INT),"
    "        CAST(o_totalprice IS NULL AS INT), CAST(o_orderdate IS NULL AS INT),"
    "        CAST(o_orderstatus IS NULL AS INT), CAST(o_orderpriority IS NULL AS INT)))"
)


@register(
    "q214_table_checksum",
    tags=("maintenance", "checksum", "agg"),
    oracle=f"""
WITH h AS (
  SELECT o_orderstatus,
         ('0x' || substr(md5({_CK_SQL_REPR}), 1, 12))::BIGINT AS rh
  FROM orders
)
SELECT o_orderstatus AS slice,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(rh) AS BIGINT) AS xor48,
       CAST(SUM(rh) AS VARCHAR) AS sum48
FROM h
GROUP BY o_orderstatus
""",
)
def q214_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum per slice — the reconciliation
    primitive for replication / migration / backfill audits at 100 TB:
    two copies of a table compare by exchanging (slice, n_rows, xor,
    sum) instead of rows. Each row hashes its CANONICAL representation
    (engine-invariant encodings; doubles via cent-quantization, never
    engine-formatted) to 48 bits of md5; slices aggregate with two
    complementary order-independent folds — XOR (cheap, but blind to a
    row appearing twice vs zero times) and the exact integer SUM
    (catches multiplicity; presented as digits since 48 bits × row
    count exceeds int64's range in DOUBLE presentation). Both folds
    merge associatively across any partitioning — the checksum of a
    union is computable from partial checksums.

    Shape: one scan, one partial-agg'd groupBy on the slice key; the
    md5 stays in the scan stage. Production would swap md5 for
    xxhash64 — md5 is the cross-engine-verifiable contract."""
    o = t(spark, sf_dir, "orders")

    def enc(c: Column) -> Column:
        return F.coalesce(c.cast("string"), F.lit("#N"))

    cols = [
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    ]
    bitmap = F.concat(*[c.isNull().cast("int").cast("string") for c in cols])
    repr_ = F.concat_ws(
        "|",
        enc(F.col("o_orderkey")),
        enc(F.col("o_custkey")),
        enc(F.floor(F.col("o_totalprice") * 100.0).cast("bigint")),
        # o_orderdate arrives TIMESTAMP_NTZ; the UTC-pinned session makes
        # the TIMESTAMP cast value-identical to DuckDB's epoch_us read
        enc(F.unix_micros(F.col("o_orderdate").cast("timestamp"))),
        enc(F.col("o_orderstatus")),
        enc(F.col("o_orderpriority")),
        bitmap,
    )
    rh = F.conv(F.substring(F.md5(repr_), 1, 12), 16, 10).cast("bigint")
    return (
        # group by the RAW status (a NULL slice stays its own row, same
        # as the oracle's GROUP BY) — coalescing the KEY would merge a
        # literal '#N' status with the NULL slice on one side only
        o.select(F.col("o_orderstatus").alias("slice"), rh.alias("rh"))
        .groupBy("slice")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor("rh").cast("bigint").alias("xor48"),
            F.sum(F.col("rh").cast("decimal(38,0)")).cast("string").alias("sum48"),
        )
    )


# ---- q215: incremental view maintenance by partial-state merge -----------

_IVM_SPLIT = 5000  # event_id threshold: base snapshot vs delta batch


@register(
    "q215_incremental_view_merge",
    tags=("maintenance", "ivm", "agg"),
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST({sql_qsum('value', 6)} AS VARCHAR) AS sum_q,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
""",
)
def q215_incremental_view_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-type aggregate view is
    computed by MERGING two independently aggregated slices — the
    "base" snapshot (event_id < {_IVM_SPLIT}) and the "delta" batch —
    exactly how a 100 TB materialized view absorbs a new ingest without
    rescanning history. COUNT/SUM merge by addition, MIN/MAX by
    min/max; COUNT(DISTINCT user) is the one non-distributive
    aggregate, so the partial state carries the distinct (type, user)
    pairs — the textbook IVM state decomposition (additive scalars +
    a distinct-key set that at production scale becomes a mergeable HLL
    sketch, q29/q201's contract).

    The oracle aggregates the unsplit table directly, so the hash check
    certifies the merge algebra, not just the formulas (q212's
    discipline, extended to min/max and distinct state)."""
    e = t(spark, sf_dir, "events")

    def slice_agg(df: DataFrame) -> DataFrame:
        # event_type is a COARSE key (a handful of values for the whole
        # table), so the quantized int64 sum takes the salted two-level
        # shape (q01's msum discipline): int64 partials per (type,
        # salt), exact DECIMAL(38,0) merge — a flat qsum here is the
        # exact overflow-at-1e12-rows/group case _util.py documents
        pre = df.groupBy("event_type", msalt("value").alias("_salt")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(mq("value", 6)).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        return pre.groupBy("event_type").agg(
            F.sum("n").alias("n"),
            F.sum(F.col("s").cast("decimal(38,0)")).alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )

    base = e.filter(F.col("event_id") < _IVM_SPLIT)
    delta = e.filter(
        F.col("event_id").isNull() | (F.col("event_id") >= _IVM_SPLIT)
    )
    merged_scalars = (
        slice_agg(base)
        .unionByName(slice_agg(delta))
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            # digits, not a numeric type: the exact sum outgrows int64
            # at the design scale and doubles can't carry it (q214's
            # presentation rule)
            F.sum("s").cast("decimal(38,0)").cast("string").alias("sum_q"),
            F.min("mn").cast("double").alias("min_value"),
            F.max("mx").cast("double").alias("max_value"),
        )
    )
    # distinct-user state: per-slice distinct pairs union-merge, then
    # one count per type (the part a sketch replaces at scale)
    pairs = (
        base.select("event_type", "user_id")
        .distinct()
        .unionByName(delta.select("event_type", "user_id").distinct())
        .distinct()
    )
    users = pairs.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users")
    )
    # null-safe join key: a NULL event_type is a real group in both
    # engines' GROUP BY; a plain inner join would silently drop it
    return merged_scalars.join(
        users,
        merged_scalars["event_type"].eqNullSafe(users["event_type"]),
    ).select(
        merged_scalars["event_type"],
        "n_events", "sum_q", "min_value", "max_value", "n_users",
    )


_KNN_EVAL_N = 50   # eval sample: vec_id < 50
_KNN_K = 5         # votes per query
_ACC_Q = 1_000_000


@register(
    "q224_knn_label_consistency",
    tags=("similarity", "llm-data", "quality", "eval"),
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel, embedding AS qv
  FROM {_SQL_EMB} embeddings WHERE vec_id < {_KNN_EVAL_N}
),
e AS (SELECT vec_id, label, embedding FROM {_SQL_EMB} embeddings),
prod AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label AS nlabel,
         e.embedding[i::INT]::DOUBLE AS x, qv[i::INT]::DOUBLE AS y
  FROM e, q, unnest(range(1, len(e.embedding) + 1)) t(i)
  WHERE e.vec_id <> q.query_id
),
agg AS (
  SELECT query_id, qlabel, vec_id, nlabel,
         CAST({sql_qsum('x * y')} AS DOUBLE) / 1e12 AS dot,
         CAST({sql_qsum('x * x')} AS DOUBLE) / 1e12 AS na,
         CAST({sql_qsum('y * y')} AS DOUBLE) / 1e12 AS nq
  FROM prod GROUP BY query_id, qlabel, vec_id, nlabel
),
ranked AS (
  SELECT query_id, qlabel, nlabel,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC) AS rn
  FROM agg
),
votes AS (
  SELECT query_id, qlabel, nlabel, CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM ranked WHERE rn <= {_KNN_K}
  GROUP BY query_id, qlabel, nlabel
),
pred AS (
  SELECT query_id, qlabel, nlabel AS predicted,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY n_votes DESC, nlabel ASC NULLS LAST) AS pr
  FROM votes
)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN predicted IS NOT DISTINCT FROM qlabel
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
       CAST(({_ACC_Q} * SUM(CASE WHEN predicted IS NOT DISTINCT FROM qlabel
                                 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS consistency_q
FROM pred WHERE pr = 1
GROUP BY qlabel
""",
)
def q224_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label-consistency audit (the mislabel detector
    curation runs before training a classifier head): for an eval
    sample of vectors, predict each one's label by majority vote of
    its {_KNN_K} nearest neighbors (leave-self-out, q53's exact
    quantized-cosine ranking, vote ties broken by smallest label
    pinned NULLS LAST in both engines — the q21 lesson), then report
    per-label consistency: how often the neighborhood agrees with the
    assigned label. Labels whose consistency collapses are candidate
    labeling errors or genuinely entangled classes.

    Shape: broadcast eval sample × corpus (the q53 brute-force arm —
    at scale the candidate set comes from the q56 IVF cells instead,
    same vote/consistency tail), one window top-k per query, a
    #queries×#labels vote agg, and a label-sized final rollup."""
    from .similarity import _qdot

    # self-norms are per-ROW quantities: compute each vector's na once
    # below the join (r12 — unmoved, the oracle's per-pair GROUP BY
    # yields the identical value; q255 already stages norms this way).
    # Inside the join's projection they re-ran the O(d) fold twice per
    # PAIR: |corpus|x|eval| extra folds for |corpus| distinct values.
    e = temb_f(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).select(
        "vec_id", "label", "v",
        (_qdot(F.col("v"), F.col("v")).cast("double") / F.lit(1e12)).alias("na"),
    )
    q = e.filter(F.col("vec_id") < _KNN_EVAL_N).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("na").alias("nq"),
    )
    agg = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "qlabel", "vec_id", F.col("label").alias("nlabel"),
            (_qdot(F.col("v"), F.col("qv")).cast("double") / F.lit(1e12)).alias("dot"),
            "na",
            "nq",
        )
    )
    cos = F.col("dot") / (F.sqrt("na") * F.sqrt("nq"))
    wk = Window.partitionBy("query_id").orderBy(
        cos.desc(), F.col("vec_id").asc()
    )
    top = (
        agg.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KNN_K)
    )
    votes = top.groupBy("query_id", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("nlabel").asc_nulls_last()
    )
    pred = (
        votes.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") == 1)
        .select("query_id", "qlabel", F.col("nlabel").alias("predicted"))
    )
    hit = F.when(F.expr("predicted <=> qlabel"), 1).otherwise(0)
    return pred.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(hit).cast("bigint").alias("n_consistent"),
        F.expr(
            f"CAST(({_ACC_Q} * SUM(CASE WHEN predicted <=> qlabel"
            " THEN 1 ELSE 0 END)) div COUNT(1) AS BIGINT)"
        ).alias("consistency_q"),
    )


# q255 — the IVF-backed arm of q224 (r6 verdict item 4): same vote /
# consistency tail, candidates from q56's inverted-file cells instead of
# the full-corpus broadcast. The cell CTEs are runtime-sliced from q56's
# REGISTERED oracle (the q175/q188 discipline), so the index this eval
# probes cannot drift from the index q56 serves.
from .similarity import (  # noqa: E402 — needs q56 registered first
    _IVF_NPROBE,
    _S,
    _SQL_IVF_CELL_CTES,
    _ivf_parts,
    _qdot,
)


@register(
    "q255_knn_consistency_ivf",
    tags=("similarity", "llm-data", "quality", "eval", "ann", "ivf"),
    oracle=f"""
{_SQL_IVF_CELL_CTES},
kq AS (
  SELECT vec_id AS query_id, label AS qlabel, embedding AS qv
  FROM {_SQL_EMB} embeddings WHERE vec_id < {_KNN_EVAL_N}
),
kass AS (
  SELECT q.query_id, k.cent_id,
         {sql_qsum('q.qv[i::INT]::DOUBLE * k.cv[i::INT]::DOUBLE')} AS qd
  FROM kq q, cents k, unnest(range(1, len(q.qv) + 1)) t(i)
  GROUP BY q.query_id, k.cent_id
),
kcells AS (
  SELECT query_id, cent_id FROM (
    SELECT a.query_id, a.cent_id,
           row_number() OVER (PARTITION BY a.query_id
             ORDER BY (CAST(a.qd AS DOUBLE) / {_S!r})
                        / sqrt(CAST(n.qnc AS DOUBLE) / {_S!r}) DESC,
                      a.cent_id ASC) AS arn
    FROM kass a JOIN cnorm n USING (cent_id)
  ) WHERE arn <= {_IVF_NPROBE}
),
candidates AS (
  SELECT kc.query_id, ce.vec_id
  FROM kcells kc JOIN cells ce USING (cent_id)
  WHERE ce.vec_id <> kc.query_id
),
labeled AS (
  SELECT c.query_id, q.qlabel, c.vec_id, e.label AS nlabel,
         e.embedding AS nv, q.qv
  FROM candidates c
  JOIN kq q ON q.query_id = c.query_id
  JOIN {_SQL_EMB} e ON e.vec_id = c.vec_id
),
prod AS (
  SELECT query_id, qlabel, vec_id, nlabel,
         nv[i::INT]::DOUBLE AS x, qv[i::INT]::DOUBLE AS y
  FROM labeled, unnest(range(1, len(nv) + 1)) t(i)
),
agg AS (
  SELECT query_id, qlabel, vec_id, nlabel,
         CAST({sql_qsum('x * y')} AS DOUBLE) / {_S!r} AS dot,
         CAST({sql_qsum('x * x')} AS DOUBLE) / {_S!r} AS na,
         CAST({sql_qsum('y * y')} AS DOUBLE) / {_S!r} AS nq
  FROM prod GROUP BY query_id, qlabel, vec_id, nlabel
),
ranked AS (
  SELECT query_id, qlabel, nlabel,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC) AS rn
  FROM agg
),
votes AS (
  SELECT query_id, qlabel, nlabel, CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM ranked WHERE rn <= {_KNN_K}
  GROUP BY query_id, qlabel, nlabel
),
pred AS (
  SELECT query_id, qlabel, nlabel AS predicted,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY n_votes DESC, nlabel ASC NULLS LAST) AS pr
  FROM votes
)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN predicted IS NOT DISTINCT FROM qlabel
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
       CAST(({_ACC_Q} * SUM(CASE WHEN predicted IS NOT DISTINCT FROM qlabel
                                 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS consistency_q
FROM pred WHERE pr = 1
GROUP BY qlabel
""",
)
def q255_knn_consistency_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q224's label-consistency audit at index speed: the candidate set
    for each eval vector comes from q56's IVF cells (query assigned to
    its {_IVF_NPROBE} nearest Voronoi cells, candidates = the corpus
    vectors living there, leave-self-out), then the IDENTICAL exact
    quantized-cosine top-{_KNN_K} vote and per-label consistency tail.
    Reading both tables side by side measures what the ANN shortcut
    costs in audit fidelity — the q188 recall discipline applied to the
    mislabel detector. n_eval can drop below q224's when a query's
    probed cells hold fewer than one labeled neighbor (empty
    neighborhoods vanish from the rollup in both engines).

    Shape at scale (vs q224's broadcast eval × FULL corpus scan): the
    corpus-side cell relation carries (label, vector, norm) as
    assignment payload — built map-side under the broadcast centroid
    fold, never exchanged — and candidates come from ONE
    BroadcastHashJoin against the {_KNN_EVAL_N}×{_IVF_NPROBE}-row query
    cell relation, so the exact re-rank touches ~nprobe/ncells of the
    corpus per query instead of all of it. The only shuffles are the
    per-query top-k window (WindowGroupLimit pre-pruned) and the
    label-sized rollups."""
    _e, _corpus, assign = _ivf_parts(spark, sf_dir)
    el = temb_f(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = el.filter(F.col("vec_id") >= 3).withColumn(
        "qnv", _qdot(F.col("v"), F.col("v"))
    )
    cells = assign(corpus, "vec_id", "v", 1, payload=("label", "v", "qnv"))
    kq = el.filter(F.col("vec_id") < _KNN_EVAL_N).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    ).withColumn("qnq", _qdot(F.col("qv"), F.col("qv")))
    kcells = assign(kq, "query_id", "qv", _IVF_NPROBE,
                    payload=("qlabel", "qv", "qnq"))
    cand = cells.join(F.broadcast(kcells), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # identical rank math to q224: each factor is a quantized BIGINT sum
    # rescaled to DOUBLE, so the cosine chain is engine-bit-identical
    cos = (_qdot(F.col("v"), F.col("qv")).cast("double") / F.lit(_S)) / (
        F.sqrt(F.col("qnv").cast("double") / F.lit(_S))
        * F.sqrt(F.col("qnq").cast("double") / F.lit(_S))
    )
    scored = cand.select(
        "query_id", "qlabel", "vec_id",
        F.col("label").alias("nlabel"), cos.alias("cos"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    top = (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KNN_K)
    )
    votes = top.groupBy("query_id", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("nlabel").asc_nulls_last()
    )
    pred = (
        votes.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") == 1)
        .select("query_id", "qlabel", F.col("nlabel").alias("predicted"))
    )
    return pred.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(
            F.when(F.expr("predicted <=> qlabel"), 1).otherwise(0)
        ).cast("bigint").alias("n_consistent"),
        F.expr(
            f"CAST(({_ACC_Q} * SUM(CASE WHEN predicted <=> qlabel"
            " THEN 1 ELSE 0 END)) div COUNT(1) AS BIGINT)"
        ).alias("consistency_q"),
    )
