"""Unit tests: ASC reader + raster operators on synthetic grids."""

from __future__ import annotations

import struct

import pytest

from geospatial_etl_pipeline_spark.operators.geotiff import (
    decode_geotiff,
    encode_geotiff as encode_geotiff_bytes,
)
from geospatial_etl_pipeline_spark.operators.raster import (
    clip_to_bbox,
    clip_to_polygon,
    encode_geotiff,
    raster_stats,
    resample_nearest,
)
from geospatial_etl_pipeline_spark.sources.asc import read_asc, write_asc


@pytest.fixture(scope="module")
def asc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("grids")
    sub = d / "07"
    sub.mkdir()
    # 10x10 grid, cells 0..99 row-major (row 0 = top), extent [0,10)x[0,10)
    write_asc(str(sub / "grid_02_a_b_mean_monthly7.asc"), 10, 10,
              [float(v) for v in range(100)])
    # 4x4 grid with NODATA holes
    cells = [1.0, -9999.0, 3.0, 4.0,
             5.0, 6.0, -9999.0, 8.0,
             9.0, 10.0, 11.0, 12.0,
             13.0, 14.0, 15.0, 16.0]
    write_asc(str(d / "small.asc"), 4, 4, cells)
    (d / "ignore.txt").write_text("not a grid")
    return str(d)


@pytest.fixture(scope="module")
def rasters(spark, asc_dir):
    return read_asc(spark, asc_dir, crs="EPSG:27200").cache()


def test_read_asc_recursive_scan(rasters):
    rows = {r["base_name"]: r for r in rasters.collect()}
    assert set(rows) == {"grid_02_a_b_mean_monthly7", "small"}
    g = rows["grid_02_a_b_mean_monthly7"]
    assert (g["width"], g["height"]) == (10, 10)
    assert g["cells"][0] == 0.0 and g["cells"][99] == 99.0
    assert g["crs"] == "EPSG:27200"
    assert rows["small"]["nodata_value"] == -9999.0


def test_raster_stats_excludes_nodata(rasters):
    stats = {r["base_name"]: r for r in raster_stats(rasters).collect()}
    s = stats["small"]
    vals = [1, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    assert s["n_cells"] == 14
    assert s["min_val"] == 1.0 and s["max_val"] == 16.0
    assert s["mean_val"] == pytest.approx(sum(vals) / 14)
    g = stats["grid_02_a_b_mean_monthly7"]
    assert g["n_cells"] == 100 and g["mean_val"] == pytest.approx(49.5)


def test_clip_to_bbox_center_semantics(spark, rasters):
    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    out = clip_to_bbox(big, 2.0, 3.0, 5.0, 7.0).collect()[0]
    # columns with centers in [2,5): c=2,3,4 ; rows with centers in [3,7):
    # y centers are 9.5-r ; keep rows r=3..6 (centers 6.5,5.5,4.5,3.5)
    assert (out["width"], out["height"]) == (3, 4)
    assert out["xllcorner"] == 2.0 and out["yllcorner"] == 3.0
    # top-left retained cell = row 3, col 2 -> value 32
    assert out["cells"][:3] == [32.0, 33.0, 34.0]
    assert out["cells"][-3:] == [62.0, 63.0, 64.0]


def test_clip_to_bbox_disjoint_is_empty(rasters):
    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    out = clip_to_bbox(big, 100.0, 100.0, 110.0, 110.0).collect()[0]
    assert out["width"] == 0 and out["cells"] == []


def test_clip_to_polygon_masks_outside(spark, rasters):
    from pyspark.sql import functions as F

    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    # triangle covering the lower-left half (y < x): cell centers with
    # ycenter < xcenter stay, everything else -> NODATA
    tri = "POLYGON((0 0, 10 0, 10 10, 0 0))"
    out = clip_to_polygon(big.withColumn("wkt", F.lit(tri)), "wkt").collect()[0]
    kept = [v for v in out["cells"] if v != -9999.0]
    # 45 centers strictly below the diagonal + 10 centers exactly ON the
    # diagonal (ray-cast even-odd counts these inside for this edge
    # orientation — boundary semantics are formulation-defined)
    assert len(kept) == 55
    # cell (row 0, col 0): center (0.5, 9.5), above the diagonal -> NODATA
    assert out["cells"][0] == -9999.0
    # cell (row 9, col 9): center (9.5, 0.5) inside
    assert out["cells"][99] == 99.0


def test_resample_nearest(rasters):
    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    out = resample_nearest(big, 2).collect()[0]
    assert (out["width"], out["height"]) == (5, 5)
    assert out["cellsize"] == 2.0
    assert out["cells"][:5] == [0.0, 2.0, 4.0, 6.0, 8.0]
    assert out["cells"][5:7] == [20.0, 22.0]


def test_encode_geotiff_is_valid_tiff(rasters):
    """The operator output is a structurally valid classic TIFF: correct
    byte-order mark, magic 42, an IFD with ascending tags, and the strip
    where StripOffsets says it is."""
    small = rasters.filter("base_name = 'small'")
    row = encode_geotiff(small).collect()[0]
    blob = row["tiff"]
    assert blob[:2] == b"II"
    assert struct.unpack_from("<H", blob, 2)[0] == 42
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n_entries,) = struct.unpack_from("<H", blob, ifd_off)
    tags = [
        struct.unpack_from("<H", blob, ifd_off + 2 + i * 12)[0]
        for i in range(n_entries)
    ]
    assert tags == sorted(tags)  # TIFF 6.0 requires ascending tag order
    assert 256 in tags and 257 in tags and 34735 in tags  # dims + GeoKeys


def test_encode_geotiff_roundtrip(rasters):
    """decode(encode(raster)) recovers dims, extent, CRS, nodata, cells."""
    small = rasters.filter("base_name = 'small'")
    row = encode_geotiff(small).collect()[0]
    src = rasters.filter("base_name = 'small'").collect()[0]
    got = decode_geotiff(row["tiff"])
    assert (got["width"], got["height"]) == (src["width"], src["height"])
    assert got["xllcorner"] == src["xllcorner"]
    assert got["yllcorner"] == pytest.approx(src["yllcorner"])
    assert got["cellsize"] == src["cellsize"]
    assert got["nodata_value"] == src["nodata_value"]
    assert got["crs"] == "EPSG:27200"
    assert got["model_type"] == "projected"
    assert got["cells"] == list(src["cells"])


def test_encode_cog_layout_is_cloud_optimized(rasters):
    """COG structural contract: tiled IFDs (multiple-of-16 tiles), an
    overview IFD flagged NewSubfileType=1, EVERY IFD serialized before
    any tile data (the range-reader property), and full-res tile data
    LAST (GDAL's COG ordering: zoomed-out reads touch the file front)."""
    from geospatial_etl_pipeline_spark.operators.geotiff import cog_ifds
    from geospatial_etl_pipeline_spark.operators.raster import encode_cog

    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    blob = encode_cog(big, tile_px=16).collect()[0]["tiff"]
    ifds = cog_ifds(blob)
    assert len(ifds) >= 2  # full res + >=1 overview
    assert ifds[0][254][0] == 0 and all(t[254][0] == 1 for t in ifds[1:])
    for t in ifds:
        assert t[322][0] % 16 == 0 and t[323][0] % 16 == 0  # tile dims
        assert len(t[324]) == len(t[325]) >= 1  # offsets/bytecounts
    first_tile_off = min(min(t[324]) for t in ifds)
    # IFD region (walk it) must end before the first tile byte
    pos = struct.unpack_from("<I", blob, 4)[0]
    while pos:
        (n,) = struct.unpack_from("<H", blob, pos)
        end = pos + 2 + n * 12 + 4
        assert pos < first_tile_off
        (pos,) = struct.unpack_from("<I", blob, end - 4)
    # full-res tiles live AFTER every overview tile
    assert min(ifds[0][324]) > max(max(t[324]) for t in ifds[1:])


def test_encode_cog_roundtrip_with_overviews(rasters):
    """decode(encode_cog(raster)) recovers level 0 exactly (through the
    deflate + tile + pad path) and each overview equals repeated
    factor-2 block_mean_downsample output."""
    from geospatial_etl_pipeline_spark.operators.geotiff import (
        block_mean_downsample,
        decode_cog,
    )
    from geospatial_etl_pipeline_spark.operators.raster import encode_cog

    src = rasters.filter("base_name = 'small'").collect()[0]
    blob = encode_cog(
        rasters.filter("base_name = 'small'"), tile_px=16
    ).collect()[0]["tiff"]
    got = decode_cog(blob)
    assert (got["width"], got["height"]) == (src["width"], src["height"])
    assert got["cells"] == list(src["cells"])
    assert got["crs"] == "EPSG:27200"
    assert got["nodata_value"] == src["nodata_value"]
    assert len(got["overviews"]) >= 1
    w, h, cv = src["width"], src["height"], list(src["cells"])
    cs = src["cellsize"]
    for o in got["overviews"]:
        w, h, cv = block_mean_downsample(w, h, cv, src["nodata_value"], 2)
        cs *= 2.0
        assert (o["width"], o["height"]) == (w, h)
        assert o["cells"] == cv
        assert o["cellsize"] == cs
        assert o["xllcorner"] == src["xllcorner"]


def test_cog_overview_kernel_equals_distributed_operator(spark, rasters):
    """The per-row overview kernel (geotiff.block_mean_downsample) is
    bit-identical to the distributed JVM operator
    (raster.downsample_block_mean) — nodata exclusion, partial edge
    blocks, and fold order all match, so the COG pyramid IS the
    operator's output."""
    from geospatial_etl_pipeline_spark.operators.geotiff import (
        block_mean_downsample,
    )
    from geospatial_etl_pipeline_spark.operators.raster import (
        downsample_block_mean,
    )

    for factor in (2, 3):
        dist = {
            r["base_name"]: r
            for r in downsample_block_mean(rasters, factor).collect()
        }
        for src in rasters.collect():
            w, h, cv = block_mean_downsample(
                src["width"], src["height"], list(src["cells"]),
                src["nodata_value"], factor,
            )
            d = dist[src["base_name"]]
            assert (d["width"], d["height"]) == (w, h)
            assert list(d["cells"]) == cv, (src["base_name"], factor)


def test_cog_range_read_single_tile(rasters):
    """The range-read property, proven not claimed: reading one tile
    through a fetch(offset, size) callback touches only the IFD walk at
    the file front plus the one tile's byte range — a small fraction of
    the file, never a full scan."""
    from geospatial_etl_pipeline_spark.operators.geotiff import read_cog_tile
    from geospatial_etl_pipeline_spark.operators.raster import encode_cog

    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    src = big.collect()[0]
    blob = encode_cog(big, tile_px=16, compress=False).collect()[0]["tiff"]
    calls: list[tuple[int, int]] = []

    def fetch(off: int, size: int) -> bytes:
        calls.append((off, size))
        return blob[off : off + size]

    t = read_cog_tile(fetch, 0, 0, 0)
    assert (t["width"], t["height"]) == (10, 10)
    for r in range(10):
        assert t["cells"][r * 10 : r * 10 + 10] == list(
            src["cells"][r * 10 : r * 10 + 10]
        )
    # last fetch is the tile itself; everything before it is header walk
    header_reads = calls[:-1]
    tile_off, tile_size = calls[-1]
    assert tile_size == 16 * 16 * 8
    header_end = max(off + size for off, size in header_reads)
    assert header_end <= tile_off  # header walk never crosses into data
    assert sum(size for _, size in header_reads) < len(blob) // 2
    # overview read touches even less: its tiles sit FIRST in the data
    calls.clear()
    o = read_cog_tile(fetch, 1, 0, 0)
    assert (o["width"], o["height"]) == (5, 5)
    assert calls[-1][0] < tile_off  # overview tile precedes full-res data


def test_encode_cog_bigtiff_roundtrip(rasters):
    """The BigTIFF path (magic 43, 8-byte offsets, LONG8 tile arrays —
    the format that lifts classic TIFF's 4 GB ceiling): identical
    round-trip, overview pyramid, and fetch-callback range-read through
    the same readers; auto mode stays classic for small files."""
    import struct as _struct

    from geospatial_etl_pipeline_spark.operators.geotiff import (
        decode_cog,
        encode_cog as encode_cog_bytes,
        read_cog_tile,
    )

    src = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'").collect()[0]
    args = (src["width"], src["height"], src["xllcorner"], src["yllcorner"],
            src["cellsize"], src["nodata_value"], src["crs"],
            list(src["cells"]))
    big = encode_cog_bytes(*args, tile_px=16, bigtiff=True)
    assert _struct.unpack_from("<H", big, 2)[0] == 43
    got = decode_cog(big)
    assert got["cells"] == list(src["cells"])
    assert got["crs"] == "EPSG:27200"
    assert len(got["overviews"]) >= 1
    # range read works identically through the BigTIFF IFD walk
    calls: list[tuple[int, int]] = []

    def fetch(off: int, size: int) -> bytes:
        calls.append((off, size))
        return big[off : off + size]

    t = read_cog_tile(fetch, 0, 0, 0)
    assert (t["width"], t["height"]) == (10, 10)
    assert t["cells"] == list(src["cells"])
    assert sum(s for _, s in calls) < len(big)  # never a full scan
    # auto mode keeps small artifacts classic
    auto = encode_cog_bytes(*args, tile_px=16)
    assert _struct.unpack_from("<H", auto, 2)[0] == 42


def test_cog_overviews_share_full_res_top_edge():
    """Odd-dimension pyramid georeferencing: block-mean overviews
    anchor at row 0, so every level's tiepoint must carry the
    FULL-RES top edge — deriving ytop from the overview's own dims
    (yll + lh·lcs) shifted odd levels one source cell north."""
    from geospatial_etl_pipeline_spark.operators.geotiff import (
        decode_cog,
        encode_cog,
    )

    w, h = 11, 9  # odd height: overview is 6x5, 5*2 != 9
    cells = [float(i) for i in range(w * h)]
    d = decode_cog(
        encode_cog(w, h, 100.0, 200.0, 1.0, -9999.0, "EPSG:2193", cells,
                   tile_px=16)
    )
    ytop0 = d["yllcorner"] + d["height"] * d["cellsize"]
    assert ytop0 == 200.0 + 9.0
    for o in d["overviews"]:
        assert o["yllcorner"] + o["height"] * o["cellsize"] == pytest.approx(
            ytop0
        )


def test_cog_auto_tile_size_fits_small_rasters():
    """tile_px=None auto-sizes: a 10x10 grid gets one 16x16 tile (a
    sub-kilobyte artifact), not a 512x512 pad-and-deflate; large
    images cap at 512."""
    from geospatial_etl_pipeline_spark.operators.geotiff import (
        decode_cog,
        encode_cog,
    )

    blob = encode_cog(10, 10, 0.0, 0.0, 1.0, -9999.0, None, [0.0] * 100)
    d = decode_cog(blob)
    assert d["tile_px"] == 16
    assert len(blob) < 2048
    assert d["cells"] == [0.0] * 100


def test_encode_cog_rejects_bad_tile_size(rasters):
    from geospatial_etl_pipeline_spark.operators.geotiff import encode_cog

    with pytest.raises(ValueError, match="multiple of 16"):
        encode_cog(4, 4, 0.0, 0.0, 1.0, -9999.0, None, [0.0] * 16, tile_px=17)


@pytest.mark.parametrize("w,h,tp", [(10, 10, 4), (7, 5, 3), (10, 10, 10),
                                    (6, 9, 2), (5, 7, 16)])
def test_tile_partitions_cells_exactly(spark, w, h, tp):
    """Property: tiles partition the raster exactly — reassembling tile
    cells by (ty, tx) recovers the whole grid, extents abut, and edge
    tiles shrink (never pad)."""
    from geospatial_etl_pipeline_spark.operators.raster import tile

    cells = [float(i) for i in range(w * h)]
    df = spark.createDataFrame(
        [("p", "g", w, h, 2.0, 3.0, 1.5, -9999.0, "EPSG:27200", cells)],
        "path string, base_name string, width int, height int, "
        "xllcorner double, yllcorner double, cellsize double, "
        "nodata_value double, crs string, cells array<double>",
    )
    tiles = {t["tile_id"]: t for t in tile(df, tp).collect()}
    ntx, nty = -(-w // tp), -(-h // tp)
    assert len(tiles) == ntx * nty
    # reassemble row-major and compare to the source
    rebuilt = []
    for r in range(h):
        for c in range(w):
            t = tiles[f"{r // tp}_{c // tp}"]
            rebuilt.append(t["cells"][(r % tp) * t["width"] + (c % tp)])
    assert rebuilt == cells
    # geometry: tile (0,0) is the TOP-left; its yll + th*cs == raster ytop
    t00 = tiles["0_0"]
    assert t00["xllcorner"] == 2.0
    assert t00["yllcorner"] + t00["height"] * 1.5 == pytest.approx(3.0 + h * 1.5)
    # all widths/heights sum correctly per band
    assert sum(tiles[f"0_{tx}"]["width"] for tx in range(ntx)) == w
    assert sum(tiles[f"{ty}_0"]["height"] for ty in range(nty)) == h


def test_tile_stats_equal_whole(rasters):
    """raster_stats composes over tiles UNCHANGED: same groupBy
    base_name over tile rows == whole-raster stats (incl. NODATA)."""
    from geospatial_etl_pipeline_spark.operators.raster import tile

    whole = {r["base_name"]: r for r in raster_stats(rasters).collect()}
    tiled = {r["base_name"]: r for r in raster_stats(tile(rasters, 3)).collect()}
    assert set(whole) == set(tiled)
    for name in whole:
        for col in ("n_cells", "min_val", "max_val"):
            assert whole[name][col] == tiled[name][col], (name, col)
        assert tiled[name]["mean_val"] == pytest.approx(whole[name]["mean_val"])
        assert tiled[name]["stddev_val"] == pytest.approx(
            whole[name]["stddev_val"]
        )


def test_tile_clip_bbox_equal_whole(spark, rasters):
    """clip_to_bbox over tiles ≡ clip over the whole raster: clipping
    each tile to the bbox and re-aggregating stats matches clipping the
    un-tiled raster (tiles fully outside collapse to 0-cell rasters)."""
    from geospatial_etl_pipeline_spark.operators.raster import tile

    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    whole = raster_stats(clip_to_bbox(big, 2.0, 3.0, 5.0, 7.0)).collect()[0]
    tiles_clipped = clip_to_bbox(tile(big, 4), 2.0, 3.0, 5.0, 7.0)
    tiled = raster_stats(tiles_clipped).collect()[0]
    assert tiled["n_cells"] == whole["n_cells"]
    assert tiled["min_val"] == whole["min_val"]
    assert tiled["max_val"] == whole["max_val"]
    assert tiled["mean_val"] == pytest.approx(whole["mean_val"])


def test_encode_geotiff_bytes_geographic_crs():
    blob = encode_geotiff_bytes(2, 2, 10.0, 20.0, 0.5, -1.0, "EPSG:4326",
                                [1.0, 2.0, 3.0, 4.0])
    got = decode_geotiff(blob)
    assert got["model_type"] == "geographic"
    assert got["crs"] == "EPSG:4326"
    assert got["cells"] == [1.0, 2.0, 3.0, 4.0]
    # tiepoint maps top-left: ytop = yll + h*cs = 21.0
    assert got["yllcorner"] == pytest.approx(20.0)


def test_downsample_block_mean_matches_numpy(rasters):
    import numpy as np

    from geospatial_etl_pipeline_spark.operators.raster import (
        downsample_block_mean,
    )

    big = rasters.filter("base_name = 'grid_02_a_b_mean_monthly7'")
    out = downsample_block_mean(big, 3).collect()[0]
    # 10x10 at factor 3 -> 4x4 output (edge blocks partial)
    assert (out["width"], out["height"]) == (4, 4)
    assert out["cellsize"] == 3.0
    ref = np.arange(100, dtype=np.float64).reshape(10, 10)
    for bj in range(4):
        for bi in range(4):
            block = ref[bj * 3 : bj * 3 + 3, bi * 3 : bi * 3 + 3]
            assert out["cells"][bj * 4 + bi] == pytest.approx(block.mean())


def test_downsample_block_mean_nodata_aware(rasters):
    from geospatial_etl_pipeline_spark.operators.raster import (
        downsample_block_mean,
    )

    small = rasters.filter("base_name = 'small'")
    out = downsample_block_mean(small, 2).collect()[0]
    assert (out["width"], out["height"]) == (2, 2)
    # top-left block {1, NODATA, 5, 6} -> mean of valid = 4.0
    assert out["cells"][0] == pytest.approx((1.0 + 5.0 + 6.0) / 3)
    # top-right block {3, 4, NODATA, 8} -> 5.0
    assert out["cells"][1] == pytest.approx((3.0 + 4.0 + 8.0) / 3)
    # bottom blocks are full
    assert out["cells"][2] == pytest.approx((9 + 10 + 13 + 14) / 4)
    assert out["cells"][3] == pytest.approx((11 + 12 + 15 + 16) / 4)


def test_focal_slope_matches_reference(spark):
    """focal_slope (struct-side Horn 3×3) must reproduce the exact
    integer kernel the declarative twin (q181) hash-checks: cells from
    the same (i*31 + j*17) % 101 formula, slope² compared per pixel
    against a Python reference; border ring must be nodata."""
    from geospatial_etl_pipeline_spark.operators.raster import focal_slope

    w, h, nd = 40, 30, -9999.0
    vals = [[(i * 31 + j * 17) % 101 for i in range(w)] for j in range(h)]
    cells = [float(v) for row in vals for v in row]
    df = spark.createDataFrame(
        [("p", "b", w, h, 0.0, 0.0, 1.0, nd, None, cells)],
        "path string, base_name string, width int, height int,"
        " xllcorner double, yllcorner double, cellsize double,"
        " nodata_value double, crs string, cells array<double>",
    )
    out = focal_slope(df).collect()[0]["cells"]

    def ref(j, i):
        gx = (
            vals[j - 1][i + 1] + 2 * vals[j][i + 1] + vals[j + 1][i + 1]
        ) - (vals[j - 1][i - 1] + 2 * vals[j][i - 1] + vals[j + 1][i - 1])
        gy = (
            vals[j + 1][i - 1] + 2 * vals[j + 1][i] + vals[j + 1][i + 1]
        ) - (vals[j - 1][i - 1] + 2 * vals[j - 1][i] + vals[j - 1][i + 1])
        return float(gx * gx + gy * gy)

    for j in range(h):
        for i in range(w):
            got = out[j * w + i]
            if j in (0, h - 1) or i in (0, w - 1):
                assert got == nd, (j, i, got)
            else:
                assert got == ref(j, i), (j, i, got, ref(j, i))


def test_focal_slope_nodata_propagates(spark):
    """A single nodata hole must poison exactly its 8 neighbors (plus
    itself) — a gradient across missing data is undefined, not zero."""
    from geospatial_etl_pipeline_spark.operators.raster import focal_slope

    w, h, nd = 10, 10, -9999.0
    cells = [1.0] * (w * h)
    cells[5 * w + 5] = nd  # hole at (r=5, c=5)
    df = spark.createDataFrame(
        [("p", "b", w, h, 0.0, 0.0, 1.0, nd, None, cells)],
        "path string, base_name string, width int, height int,"
        " xllcorner double, yllcorner double, cellsize double,"
        " nodata_value double, crs string, cells array<double>",
    )
    out = focal_slope(df).collect()[0]["cells"]
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            got = out[r * w + c]
            if abs(r - 5) <= 1 and abs(c - 5) <= 1:
                assert got == nd, (r, c, got)
            else:
                assert got == 0.0, (r, c, got)  # flat field -> zero slope
