"""Geometry queries (SURVEY §2i) — the oracle-expressible subset.

No spatial library exists in either engine here, so these queries use
integer planar coordinates synthesized from testdata keys: envelope
(bbox) aggregation + WKT polygon encoding, rectangle containment joins
(the clip predicate), and nearest-centroid assignment. The full WKT /
reprojection function surface lives in ``functions.geometry`` (unit-
tested; not oracle-checkable without a spatial oracle — SURVEY §7
Phase 3 allows rows-only there).

Integer coordinates are deliberate: envelope/containment/distance² stay
in exact integer arithmetic, so results are engine-identical with no
float formatting concerns in the WKT strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import literal_df, qsum, sql_qsum, t
from .catalog import register

# x/y in [0, 97) × [0, 89): coprime moduli give a scattered point cloud.
_X = "CAST(c_custkey % 97 AS INT)"
_Y = "CAST(c_custkey % 89 AS INT)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_custkey") % 97).cast("int").alias("x"),
        (F.col("c_custkey") % 89).cast("int").alias("y"),
    )


@register(
    "q80_envelope_wkt_per_nation",
    tags=("geometry", "agg"),
    oracle=f"""
SELECT c_nationkey,
       MIN({_X}) AS xmin, MIN({_Y}) AS ymin,
       MAX({_X}) AS xmax, MAX({_Y}) AS ymax,
       COUNT(*) AS n_points,
       concat('POLYGON((',
              MIN({_X}), ' ', MIN({_Y}), ', ',
              MAX({_X}), ' ', MIN({_Y}), ', ',
              MAX({_X}), ' ', MAX({_Y}), ', ',
              MIN({_X}), ' ', MAX({_Y}), ', ',
              MIN({_X}), ' ', MIN({_Y}), '))') AS envelope_wkt
FROM customer
GROUP BY c_nationkey
""",
)
def q80_envelope_wkt_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Envelope + envelope->polygon semantics (copy_esrigrid…py:280,
    438): bbox aggregate per nation, encoded as a closed WKT ring —
    ST_PolygonFromEnvelope re-expressed as min/max aggregation."""
    pts = _points(spark, sf_dir)
    env = pts.groupBy("c_nationkey").agg(
        F.min("x").alias("xmin"), F.min("y").alias("ymin"),
        F.max("x").alias("xmax"), F.max("y").alias("ymax"),
        F.count(F.lit(1)).alias("n_points"),
    )
    wkt = F.concat(
        F.lit("POLYGON(("),
        F.col("xmin"), F.lit(" "), F.col("ymin"), F.lit(", "),
        F.col("xmax"), F.lit(" "), F.col("ymin"), F.lit(", "),
        F.col("xmax"), F.lit(" "), F.col("ymax"), F.lit(", "),
        F.col("xmin"), F.lit(" "), F.col("ymax"), F.lit(", "),
        F.col("xmin"), F.lit(" "), F.col("ymin"), F.lit("))"),
    )
    return env.select(
        "c_nationkey", "xmin", "ymin", "xmax", "ymax", "n_points",
        wkt.alias("envelope_wkt"),
    )


_RECTS = [
    ("r1", 0, 0, 48, 44), ("r2", 48, 0, 97, 44),
    ("r3", 0, 44, 48, 89), ("r4", 30, 20, 70, 60),
]
_SQL_RECTS = ", ".join(
    f"('{r}', {a}, {b}, {c}, {d})" for r, a, b, c, d in _RECTS
)


@register(
    "q81_point_in_rect_join",
    tags=("geometry", "spatial-join"),
    oracle=f"""
SELECT r.rect_id, COUNT(*) AS n_points,
       COUNT(DISTINCT c.c_nationkey) AS n_nations
FROM customer c
JOIN (VALUES {_SQL_RECTS}) AS r(rect_id, xmin, ymin, xmax, ymax)
  ON {_X} >= r.xmin AND {_X} < r.xmax AND {_Y} >= r.ymin AND {_Y} < r.ymax
GROUP BY r.rect_id
""",
)
def q81_point_in_rect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clip predicate as a spatial containment join: points ⋈ regions
    on rectangle containment (right-open edges — the cell-center-in-
    polygon convention chosen for clip, SURVEY §7). The region side is a
    broadcast nested-loop join; at 100 TB this is exactly the shape that
    geohash-bucket pre-filtering turns into an equi-join."""
    pts = _points(spark, sf_dir)
    rects = literal_df(
        spark, _RECTS, ["rect_id", "xmin", "ymin", "xmax", "ymax"]
    )
    cond = (
        (pts.x >= F.col("xmin")) & (pts.x < F.col("xmax"))
        & (pts.y >= F.col("ymin")) & (pts.y < F.col("ymax"))
    )
    return (
        pts.join(F.broadcast(rects), cond)
        .groupBy("rect_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
    )


_CENTROIDS = [(1, 20, 20), (2, 70, 20), (3, 20, 70), (4, 70, 70), (5, 48, 44)]
_SQL_CENTROIDS = ", ".join(f"({c}, {x}, {y})" for c, x, y in _CENTROIDS)


@register(
    "q82_nearest_centroid",
    tags=("geometry", "knn"),
    oracle=f"""
WITH d AS (
  SELECT c.c_custkey, k.cid,
         ({_X} - k.cx) * ({_X} - k.cx) + ({_Y} - k.cy) * ({_Y} - k.cy) AS dist2,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY c.c_custkey
           ORDER BY ({_X} - k.cx) * ({_X} - k.cx)
                  + ({_Y} - k.cy) * ({_Y} - k.cy) ASC, k.cid ASC
         ) AS INT) AS rn
  FROM customer c, (VALUES {_SQL_CENTROIDS}) AS k(cid, cx, cy)
)
SELECT cid, COUNT(*) AS n_assigned,
       CAST(MIN(dist2) AS BIGINT) AS min_dist2,
       CAST(MAX(dist2) AS BIGINT) AS max_dist2
FROM d WHERE rn = 1
GROUP BY cid
""",
)
def q82_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (one k-means step / 1-NN join): exact
    integer distance², deterministic argmin with tiebreak on centroid id.

    The centroid set is a literal, so the argmin is an IN-ROW array_min
    over k (dist2, cid) structs — struct ordering IS the window's
    (dist2 ASC, cid ASC) — and the only shuffle is the final per-cid
    aggregate. The previous crossJoin(x k) + row_number shuffled
    customers x k rows on c_custkey first."""
    pts = _points(spark, sf_dir)
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (
                        (pts.x - F.lit(cx)) * (pts.x - F.lit(cx))
                        + (pts.y - F.lit(cy)) * (pts.y - F.lit(cy))
                    ).alias("dist2"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cx, cy in _CENTROIDS
            ]
        )
    )
    assigned = pts.select(
        best["cid"].alias("cid"), best["dist2"].alias("dist2")
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.min("dist2").cast("bigint").alias("min_dist2"),
        F.max("dist2").cast("bigint").alias("max_dist2"),
    )


_BIN_CELL = 16.0  # grid-cell size for the binned spatial join
_SQL_RECTS_SP = (
    "('r1', 0, 0, 30, 25), ('r2', 20, 10, 60, 50), ('r3', 50, 40, 97, 89), "
    "('r4', 10, 60, 45, 89), ('r5', 64, 0, 96, 32)"
)
_RECTS_SP = [
    ("r1", 0, 0, 30, 25), ("r2", 20, 10, 60, 50), ("r3", 50, 40, 97, 89),
    ("r4", 10, 60, 45, 89), ("r5", 64, 0, 96, 32),
]


@register(
    "q85_spatial_bin_join",
    tags=("geometry", "spatial-join", "join", "agg"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_X} AS x, {_Y} AS y FROM customer
)
SELECT r.rid,
       COUNT(*) AS n_points,
       CAST(MIN(p.c_custkey) AS BIGINT) AS min_key,
       CAST(SUM(p.x) AS BIGINT) AS sum_x,
       CAST(SUM(p.y) AS BIGINT) AS sum_y
FROM pts p
JOIN (VALUES {_SQL_RECTS_SP}) AS r(rid, xmin, ymin, xmax, ymax)
  ON p.x >= r.xmin AND p.x < r.xmax AND p.y >= r.ymin AND p.y < r.ymax
GROUP BY r.rid
""",
)
def q85_spatial_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial join (operators.spatial): the oracle states
    the quadratic containment spec (non-equi theta join — the plan shape
    that dies at 100 TB as a BroadcastNestedLoopJoin); the engine runs
    the SCALE form — both sides keyed by the grid cells they touch, a
    plain equi-join on (bx, by), exact predicate as post-filter. Same
    pairs, shuffle bounded by cell occupancy. Cell size {_BIN_CELL} ≈
    rect scale keeps per-rect covers small. Equi-join plan asserted in
    test_plan_shapes; skew on hot cells composes with operators/skew."""
    from ..operators.spatial import bin_join_points_in_rects

    pts = _points(spark, sf_dir).select("c_custkey", "x", "y")
    rects = literal_df(
        spark, _RECTS_SP, ["rid", "xmin", "ymin", "xmax", "ymax"]
    )
    joined = bin_join_points_in_rects(pts, rects, cell=_BIN_CELL)
    return joined.groupBy("rid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("c_custkey").cast("bigint").alias("min_key"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
    )


def _morton_sql(xcol: str, ycol: str, bits: int = 7) -> str:
    """Bit-interleaved Morton/Z-order code as pure integer arithmetic —
    the same expression string drives Spark (via F.expr) and DuckDB, so
    the encoding cannot drift between engines."""
    terms = []
    for i in range(bits):
        # bit i of v == (v % 2^(i+1)) >= 2^i  — pure integer modulo and
        # CASE, the dialect intersection (Spark has no `//`, DuckDB's
        # `/` is float division)
        terms.append(
            f"(CASE WHEN ({xcol} % {1 << (i + 1)}) >= {1 << i}"
            f" THEN {1 << (2 * i)} ELSE 0 END)"
        )
        terms.append(
            f"(CASE WHEN ({ycol} % {1 << (i + 1)}) >= {1 << i}"
            f" THEN {1 << (2 * i + 1)} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_Z_COARSE_SHIFT = 64  # 2^6: drop 3 bits per axis -> 8x8-unit cells


@register(
    "q161_zorder_cells",
    tags=("geometry", "spatial", "partitioning", "zorder"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_X} AS x, {_Y} AS y FROM customer
),
coded AS (
  SELECT c_custkey, x, y,
         {_morton_sql('x', 'y')} AS z
  FROM pts
)
SELECT CAST(z // {_Z_COARSE_SHIFT} AS BIGINT) AS zcell,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(z) AS BIGINT) AS z_min,
       CAST(MAX(z) AS BIGINT) AS z_max,
       CAST(MIN(x) AS INT) AS x_min,
       CAST(MAX(x) AS INT) AS x_max,
       CAST(MIN(y) AS INT) AS y_min,
       CAST(MAX(y) AS INT) AS y_max
FROM coded
GROUP BY zcell
""",
)
def q161_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve cell census: every point gets a
    bit-interleaved 14-bit code; the census reports, per coarse cell
    (top 8 code bits), the population and the x/y extents of its
    points.

    WHY this is a first-class 100 TB operator: Z-order is the
    clustering key that makes 2-D predicates prunable by 1-D file
    statistics — write the corpus `repartitionByRange(z)` and a
    rectangle query touches only files whose [z_min, z_max] ranges
    intersect the rect's Z intervals (the Delta/Iceberg Z-ORDER BY
    layout). The tight per-cell x/y extents this census emits ARE the
    pruning evidence: bounded extents per contiguous code range is
    exactly the locality the curve promises (tests pin cell extents ≤
    8×8 units). The encode is the same integer expression string in
    both engines — in-row, zero shuffle — and the census is one hash
    agg with map-side combine."""
    pts = _points(spark, sf_dir)
    coded = pts.select(
        "c_custkey",
        "x",
        "y",
        F.expr(_morton_sql("x", "y")).alias("z"),
    )
    return coded.groupBy(
        F.floor(F.col("z") / _Z_COARSE_SHIFT).cast("bigint").alias("zcell")
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("z").cast("bigint").alias("z_min"),
        F.max("z").cast("bigint").alias("z_max"),
        F.min("x").cast("int").alias("x_min"),
        F.max("x").cast("int").alias("x_max"),
        F.min("y").cast("int").alias("y_min"),
        F.max("y").cast("int").alias("y_max"),
    )


# Demo query rectangle for the pruning report (cell space: x 24..55,
# y 40..71 — a 32×32 window off the cell grid's corner).
_ZQ = {"xmin": 24, "xmax": 55, "ymin": 40, "ymax": 71}


@register(
    "q189_zorder_pruning_report",
    tags=("geometry", "spatial", "partitioning", "zorder", "eval"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_X} AS x, {_Y} AS y FROM customer
),
coded AS (
  SELECT c_custkey, x, y, {_morton_sql('x', 'y')} AS z FROM pts
),
cells AS (
  SELECT CAST(z // {_Z_COARSE_SHIFT} AS BIGINT) AS zcell,
         CAST(COUNT(*) AS BIGINT) AS n_points,
         MIN(x) AS x_min, MAX(x) AS x_max,
         MIN(y) AS y_min, MAX(y) AS y_max
  FROM coded GROUP BY zcell
),
flagged AS (
  SELECT zcell, n_points,
         CASE WHEN x_max >= {_ZQ['xmin']} AND x_min <= {_ZQ['xmax']}
               AND y_max >= {_ZQ['ymin']} AND y_min <= {_ZQ['ymax']}
              THEN 1 ELSE 0 END AS touched
  FROM cells
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_matched
  FROM pts
  WHERE x >= {_ZQ['xmin']} AND x <= {_ZQ['xmax']}
    AND y >= {_ZQ['ymin']} AND y <= {_ZQ['ymax']}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_total,
       CAST(SUM(touched) AS BIGINT) AS n_cells_touched,
       CAST(SUM(n_points) AS BIGINT) AS n_points_total,
       CAST(SUM(touched * n_points) AS BIGINT) AS n_points_scanned,
       CAST(MIN(e.n_matched) AS BIGINT) AS n_points_matched,
       -- amplification is undefined when the rectangle matches nothing:
       -- NULL in both engines, never a /0 (Spark ANSI errors where
       -- DuckDB does not — all_one fixture, r10)
       CASE WHEN MIN(e.n_matched) > 0
            THEN CAST(SUM(touched * n_points) AS DOUBLE) / MIN(e.n_matched)
       END AS scan_amplification
FROM flagged, exact e
""",
)
def q189_zorder_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff report for q161's Z-order layout: for a demo query
    rectangle, how many coarse Z-cells a pruned scan touches, how many
    points that reads, versus the exact match count — ending in the
    scan-amplification factor (points read / points matched). This is
    the number a layout review compares against amplification ~n/match
    for an unclustered scan: file-statistics pruning in one table.

    Cells prune on their OBSERVED x/y extents — exactly the min/max
    column statistics a parquet footer would carry for materialized
    x/y columns under a z-ordered layout. All-integer arithmetic; one
    cell census + one exact count, both single partial aggs, joined as
    1-row/16-row broadcasts."""
    pts = _points(spark, sf_dir)
    coded = pts.select(
        "x", "y", F.expr(_morton_sql("x", "y")).alias("z")
    )
    cells = coded.groupBy(
        F.floor(F.col("z") / _Z_COARSE_SHIFT).cast("bigint").alias("zcell")
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    touched = (
        (F.col("x_max") >= _ZQ["xmin"])
        & (F.col("x_min") <= _ZQ["xmax"])
        & (F.col("y_max") >= _ZQ["ymin"])
        & (F.col("y_min") <= _ZQ["ymax"])
    ).cast("int")
    flagged = cells.select("zcell", "n_points", touched.alias("touched"))
    exact = pts.filter(
        (F.col("x") >= _ZQ["xmin"])
        & (F.col("x") <= _ZQ["xmax"])
        & (F.col("y") >= _ZQ["ymin"])
        & (F.col("y") <= _ZQ["ymax"])
    ).agg(F.count(F.lit(1)).alias("n_matched"))
    return flagged.crossJoin(F.broadcast(exact)).agg(
        F.count(F.lit(1)).alias("n_cells_total"),
        F.sum("touched").cast("bigint").alias("n_cells_touched"),
        F.sum("n_points").cast("bigint").alias("n_points_total"),
        F.sum(F.col("touched") * F.col("n_points"))
        .cast("bigint")
        .alias("n_points_scanned"),
        F.min("n_matched").cast("bigint").alias("n_points_matched"),
        # NULL when nothing matches — never a /0 (all_one fixture, r10)
        F.when(
            F.min("n_matched") > 0,
            F.sum(F.col("touched") * F.col("n_points")).cast("double")
            / F.min("n_matched"),
        ).alias("scan_amplification"),
    )


# ---- q203: inverse-distance-weighted interpolation -----------------------

# Interpolation grid: cell centers every 12 units over the point cloud's
# [0,97) x [0,89) extent -> 8 x 7 = 56 cells; influence radius 18.
_IDW_STEP = 12
_IDW_NX, _IDW_NY = 8, 7
_IDW_R2 = 18 * 18
# contribution = c_acctbal / (d2+1): |x| <= ~1e4, so scale-10
# quantization stays under 2^53 (1e4 * 1e10 = 1e14 < 9e15).
_IDW_SCALE = 10


@register(
    "q203_idw_interpolation",
    tags=("geometry", "spatial-join", "interpolation", "agg"),
    oracle=f"""
WITH cells AS (
  SELECT CAST(gi.range * {_IDW_NY} + gj.range AS BIGINT) AS cell_id,
         CAST(6 + {_IDW_STEP} * gi.range AS INT) AS cx,
         CAST(6 + {_IDW_STEP} * gj.range AS INT) AS cy
  FROM range({_IDW_NX}) gi CROSS JOIN range({_IDW_NY}) gj
),
hits AS (
  SELECT cell_id, cx, cy,
         ({_X} - cx) * ({_X} - cx) + ({_Y} - cy) * ({_Y} - cy) AS d2,
         c.c_acctbal
  FROM customer c JOIN cells
    ON ({_X} - cx) * ({_X} - cx) + ({_Y} - cy) * ({_Y} - cy) <= {_IDW_R2}
)
SELECT cell_id, cx, cy, COUNT(*) AS n_points,
       {sql_qsum("c_acctbal / (d2 + 1)", _IDW_SCALE)} AS num_q,
       {sql_qsum("1.0e0 / (d2 + 1)", _IDW_SCALE)} AS den_q,
       {sql_qsum("c_acctbal / (d2 + 1)", _IDW_SCALE)}
         / {sql_qsum("1.0e0 / (d2 + 1)", _IDW_SCALE)} AS idw_value
FROM hits
GROUP BY cell_id, cx, cy
""",
)
def q203_idw_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted interpolation of a point attribute onto
    a regular analysis grid (the classic points->surface geoprocessing
    op the reference's raster stage consumes, copy_esrigrid…py:229-270
    operates on exactly such interpolated grids): for every cell center,
    idw = sum(v_i / (d2_i+1)) / sum(1 / (d2_i+1)) over points within the
    influence radius.

    Plan shape: the 56-cell grid is a broadcast nested-loop join against
    the point cloud (radius predicate), then one per-cell aggregate — no
    shuffle of the point side before the partial agg. At 100 TB the
    radius join becomes an equi-join on floor(x/R),floor(y/R) bins
    expanded to the 3x3 neighbor ring (q85's binning), which keeps the
    pairing linear in points; the per-cell aggregate is unchanged.
    Weighted sums are scale-10 floor-quantized (engine-exact); the final
    ratio is one BIGINT/BIGINT division -> identical double."""
    pts = t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 97).cast("int").alias("x"),
        (F.col("c_custkey") % 89).cast("int").alias("y"),
        "c_acctbal",
    )
    cells = (
        spark.range(_IDW_NX)
        .select(F.col("id").alias("gi"))
        .crossJoin(spark.range(_IDW_NY).select(F.col("id").alias("gj")))
        .select(
            (F.col("gi") * _IDW_NY + F.col("gj")).alias("cell_id"),
            (F.lit(6) + _IDW_STEP * F.col("gi")).cast("int").alias("cx"),
            (F.lit(6) + _IDW_STEP * F.col("gj")).cast("int").alias("cy"),
        )
    )
    d2 = (pts.x - F.col("cx")) * (pts.x - F.col("cx")) + (
        pts.y - F.col("cy")
    ) * (pts.y - F.col("cy"))
    hits = pts.join(F.broadcast(cells), d2 <= _IDW_R2).select(
        "cell_id", "cx", "cy", d2.alias("d2"), "c_acctbal"
    )
    w = F.lit(1.0) / (F.col("d2") + 1)
    num = qsum(F.col("c_acctbal") / (F.col("d2") + 1), _IDW_SCALE)
    den = qsum(w, _IDW_SCALE)
    return hits.groupBy("cell_id", "cx", "cy").agg(
        F.count(F.lit(1)).alias("n_points"),
        num.alias("num_q"),
        den.alias("den_q"),
        (num / den).alias("idw_value"),
    )


# ---- q210: nearest-neighbor spatial join ---------------------------------

# Supplier "station" coordinates: multiplicative scatter over the same
# plane as the customer cloud (s_suppkey is dense 1..N, so the raw
# modulus would collapse to a line).
_SX = "CAST((s_suppkey * 37) % 97 AS INT)"
_SY = "CAST((s_suppkey * 53) % 89 AS INT)"


@register(
    "q210_spatial_nn_join",
    tags=("geometry", "knn", "spatial-join", "agg"),
    oracle=f"""
WITH nn AS (
  SELECT c.c_custkey, s.s_suppkey, s.s_nationkey,
         ({_X} - {_SX}) * ({_X} - {_SX})
           + ({_Y} - {_SY}) * ({_Y} - {_SY}) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_custkey
           ORDER BY ({_X} - {_SX}) * ({_X} - {_SX})
                  + ({_Y} - {_SY}) * ({_Y} - {_SY}) ASC, s.s_suppkey ASC
         ) AS rn
  FROM (SELECT * FROM customer WHERE c_custkey IS NOT NULL) c
  CROSS JOIN (SELECT * FROM supplier WHERE s_suppkey IS NOT NULL) s
)
SELECT s_suppkey, s_nationkey,
       COUNT(*) AS n_customers,
       CAST(MIN(d2) AS BIGINT) AS min_d2,
       CAST(MAX(d2) AS BIGINT) AS max_d2
FROM nn WHERE rn = 1
GROUP BY s_suppkey, s_nationkey
""",
)
def q210_spatial_nn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor spatial join (each customer point -> its closest
    supplier station, exact integer distance², ties broken on supplier
    id): the "assign every parcel to its service point" geoprocessing
    primitive. Output is the per-station assignment census.

    Plan shape: the station side is dimension-sized -> broadcast, then
    the argmin is a map-side partial min(struct(d2, suppkey)) per
    customer — the struct's field order IS the (d2 ASC, suppkey ASC)
    tiebreak — so the only shuffles are the two aggregates, never the
    fanned-out pair relation. At 100 TB with a big right side the same
    plan degrades gracefully: bin both sides to an R-grid and expand the
    probe to rings of increasing radius until a hit (q85's machinery);
    the argmin agg is unchanged. The oracle takes the ROW_NUMBER
    formulation — a deliberately different algorithm for the same
    semantics, so a shared-formula bug cannot hide."""
    # NULL keys are excluded on BOTH sides: a NULL-key station yields a
    # NULL d2, and Spark's min(struct) ranks a NULL leading field FIRST
    # where the oracle's ORDER BY ranks it LAST — the pinned
    # NULLS FIRST/LAST divergence class (hostile-sweep rule)
    pts = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isNotNull())
        .select(
            "c_custkey",
            (F.col("c_custkey") % 97).cast("int").alias("x"),
            (F.col("c_custkey") % 89).cast("int").alias("y"),
        )
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey").isNotNull())
        .select(
            "s_suppkey",
            "s_nationkey",
            ((F.col("s_suppkey") * 37) % 97).cast("int").alias("sx"),
            ((F.col("s_suppkey") * 53) % 89).cast("int").alias("sy"),
        )
    )
    d2 = (pts.x - F.col("sx")) * (pts.x - F.col("sx")) + (
        pts.y - F.col("sy")
    ) * (pts.y - F.col("sy"))
    best = (
        pts.crossJoin(F.broadcast(sup))
        .groupBy("c_custkey")
        .agg(
            F.min(
                F.struct(
                    d2.alias("d2"),
                    F.col("s_suppkey").alias("s_suppkey"),
                    F.col("s_nationkey").alias("s_nationkey"),
                )
            ).alias("nn")
        )
    )
    return best.groupBy(
        F.col("nn.s_suppkey").alias("s_suppkey"),
        F.col("nn.s_nationkey").alias("s_nationkey"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("nn.d2").cast("bigint").alias("min_d2"),
        F.max("nn.d2").cast("bigint").alias("max_d2"),
    )
