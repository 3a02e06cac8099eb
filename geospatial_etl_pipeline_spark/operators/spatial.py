"""Grid-bucketed spatial join — the scale form of the domain core.

A naive spatial join (every geometry against every region) compiles to
a BroadcastNestedLoopJoin: O(|A|·|B|) comparisons, the thing that dies
first at 100 TB. The standard fix (Sedona/GeoSpark's partitioned join,
PostGIS's gist prefilter) is SPATIAL BINNING: key both sides by the
fixed grid cells their geometry touches, equi-join on the cell key so
only co-located candidates meet, then apply the exact predicate as a
post-filter.

``bin_join_points_in_rects`` implements it for the point-in-rectangle
case (the reference's region-clip envelope test, copy_esrigrid…py:
303–310, generalizes the same way — polygon candidates still come from
the bbox cover):

- a point maps to exactly ONE cell — so each (point, rect) candidate
  pair arises at most once and no dedup pass is needed;
- a rectangle maps to every cell its bbox overlaps (a tiny in-row
  sequence×sequence explode — rect_cells ≈ area/cell²);
- the join is a plain equi-join on (bx, by): shuffle keyed on cells,
  bounded by cell occupancy, never |points|×|rects|.

Cell-size dial: cells ≈ the typical rect size keeps the per-rect cover
small AND the per-cell point count even; hotspots (all data in one
cell) are the usual skew problem — AQE skew-join or salting on top of
the cell key (operators/skew.py) composes directly.

Asserted in tests/test_plan_shapes.py: the physical plan contains an
equi-join (hash/sort-merge), NOT BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_cell(df: DataFrame, x: str, y: str, cell: float) -> DataFrame:
    """Append the (bx, by) grid-cell key for a point column pair."""
    return df.select(
        "*",
        F.floor(F.col(x) / cell).cast("long").alias("bx"),
        F.floor(F.col(y) / cell).cast("long").alias("by"),
    )


def rect_cells(
    df: DataFrame,
    xmin: str, ymin: str, xmax: str, ymax: str,
    cell: float,
) -> DataFrame:
    """Explode each rectangle to the grid cells its bbox overlaps
    (half-open [min, max) extent: a rect touching a cell boundary does
    not claim the next cell)."""
    bx0 = F.floor(F.col(xmin) / cell).cast("long")
    by0 = F.floor(F.col(ymin) / cell).cast("long")
    # half-open: subtract an epsilon-free integer form — the last cell
    # is the one containing max - (anything positive), i.e. ceil(max/c)-1;
    # for max exactly on a boundary that is the PREVIOUS cell.
    bx1 = (F.ceil(F.col(xmax) / cell) - 1).cast("long")
    by1 = (F.ceil(F.col(ymax) / cell) - 1).cast("long")
    return (
        df.select(
            "*",
            F.explode(F.sequence(bx0, F.greatest(bx1, bx0))).alias("bx"),
            by0.alias("_by0"), F.greatest(by1, by0).alias("_by1"),
        )
        .select(
            "*", F.explode(F.sequence(F.col("_by0"), F.col("_by1"))).alias("by")
        )
        .drop("_by0", "_by1")
    )


def bin_join_points_in_rects(
    points: DataFrame,
    rects: DataFrame,
    cell: float,
    x: str = "x", y: str = "y",
    xmin: str = "xmin", ymin: str = "ymin",
    xmax: str = "xmax", ymax: str = "ymax",
) -> DataFrame:
    """All (point, rect) pairs with the point inside the rect
    (half-open: xmin <= x < xmax, ymin <= y < ymax), joined through the
    grid-cell equi-key. Output = point columns + rect columns."""
    p = with_cell(points, x, y, cell)
    r = rect_cells(rects, xmin, ymin, xmax, ymax, cell)
    exact = (
        (F.col(x) >= F.col(xmin)) & (F.col(x) < F.col(xmax))
        & (F.col(y) >= F.col(ymin)) & (F.col(y) < F.col(ymax))
    )
    return p.join(r, ["bx", "by"]).filter(exact).drop("bx", "by")
