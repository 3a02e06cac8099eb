"""Unit tests: pure-Python geometry primitives + pandas-UDF wrappers."""

from __future__ import annotations

import json

import numpy as np
import pytest

from geospatial_etl_pipeline_spark.functions.geometry import (
    envelope,
    envelope_polygon,
    geojson_polygon,
    lonlat_to_nztm,
    lonlat_to_webmercator,
    parse_wkt_polygon,
    points_in_polygon,
    polygon_wkt,
    shoelace_area,
)

SQUARE = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"
WITH_HOLE = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"


def test_wkt_roundtrip():
    rings = parse_wkt_polygon(SQUARE)
    assert len(rings) == 1 and rings[0].shape == (5, 2)
    assert polygon_wkt(rings) == "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"


def test_envelope_and_polygon():
    rings = parse_wkt_polygon("POLYGON((1 2, 5 2, 3 7, 1 2))")
    assert envelope(rings) == (1.0, 2.0, 5.0, 7.0)
    ring = envelope_polygon(1, 2, 5, 7)
    assert ring[0].tolist() == [1, 2] and ring[2].tolist() == [5, 7]
    assert (ring[0] == ring[-1]).all()


def test_geojson_polygon_shape():
    doc = json.loads(geojson_polygon(parse_wkt_polygon(SQUARE)))
    assert doc["type"] == "Polygon"
    assert doc["coordinates"][0][0] == [0.0, 0.0]
    assert len(doc["coordinates"][0]) == 5


def test_area_with_hole():
    rings = parse_wkt_polygon(WITH_HOLE)
    outer = abs(shoelace_area(rings[0]))
    hole = abs(shoelace_area(rings[1]))
    assert outer == 100.0 and hole == 4.0


def test_points_in_polygon_even_odd():
    rings = parse_wkt_polygon(WITH_HOLE)
    xs = np.array([5.0, 1.0, 11.0, 5.0])
    ys = np.array([5.0, 1.0, 5.0, 0.5])
    inside = points_in_polygon(xs, ys, rings)
    # (5,5) is inside the hole -> False; (1,1) inside; (11,5) outside
    assert inside.tolist() == [False, True, False, True]


def test_nztm_known_point():
    # Wellington ~ (174.7772 E, -41.2889 S); NZTM2000 E 1748813.84,
    # N 5427648.31 — value cross-verified against an independent Redfearn
    # formulation (agreement < 1 mm). NZGD2000≈WGS84; no NTv2 shift for
    # modern coordinates.
    e, n = lonlat_to_nztm(np.array([174.7772]), np.array([-41.2889]))
    assert e[0] == pytest.approx(1_748_813.84, abs=0.01)
    assert n[0] == pytest.approx(5_427_648.31, abs=0.01)


def test_webmercator_known_point():
    x, y = lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(20037508.34, rel=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_spark_udfs(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 5.0, 5.0), (3, 11.0, 1.0)], ["id", "x", "y"]
    ).withColumn("wkt", F.lit(WITH_HOLE))
    from geospatial_etl_pipeline_spark.functions.geometry import (
        st_area,
        st_asgeojson,
        st_contains_wkt,
        st_envelope_wkt,
    )

    rows = df.select(
        "id",
        st_contains_wkt("wkt", "x", "y").alias("inside"),
        st_envelope_wkt("wkt").alias("env"),
        st_area("wkt").alias("area"),
        st_asgeojson("wkt").alias("gj"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["inside"] is True
    assert by_id[2]["inside"] is False  # inside the hole
    assert by_id[3]["inside"] is False
    assert by_id[1]["area"] == 96.0
    assert by_id[1]["env"].startswith("POLYGON((0 0, 10 0")
    assert json.loads(by_id[1]["gj"])["type"] == "Polygon"


# --------------------------------------------------------------------------
# NTv2 datum-shift hook (functions/datum.py)
# --------------------------------------------------------------------------


def _nz_fixture_grid(nrows=15, ncols=14):
    """Synthetic NZ-extent NTv2 grid whose node shifts are EXACTLY the
    3-parameter fallback's shifts — so grid-path vs fallback-path
    agreement is pure interpolation error, and the pinned
    FALLBACK_TOLERANCE_M documents the real-grid bound."""
    import numpy as np

    from geospatial_etl_pipeline_spark.functions.datum import (
        NTv2Grid,
        nzgd1949_to_nzgd2000,
    )

    s_lat, n_lat = -48.0 * 3600, -34.0 * 3600
    e_long, w_long = -179.0 * 3600, -166.0 * 3600  # positive-west secs
    lat_inc = (n_lat - s_lat) / (nrows - 1)
    long_inc = (w_long - e_long) / (ncols - 1)
    lats = (s_lat + lat_inc * np.arange(nrows)) / 3600.0
    lons_w = e_long + long_inc * np.arange(ncols)
    lons = -lons_w / 3600.0
    LON, LAT = np.meshgrid(lons, lats)
    lon2, lat2 = nzgd1949_to_nzgd2000(LON.ravel(), LAT.ravel(), grid=False)
    dlat_sec = (lat2 - LAT.ravel()) * 3600.0
    dlon_w_sec = -(lon2 - LON.ravel()) * 3600.0
    return NTv2Grid(s_lat, n_lat, e_long, w_long, lat_inc, long_inc,
                    dlat_sec, dlon_w_sec)


def test_ntv2_gsb_roundtrip():
    import numpy as np

    from geospatial_etl_pipeline_spark.functions.datum import (
        make_ntv2_bytes,
        parse_ntv2,
    )

    g = _nz_fixture_grid(5, 4)
    blob = make_ntv2_bytes(g.s_lat, g.n_lat, g.e_long, g.w_long,
                           g.lat_inc, g.long_inc,
                           g.lat_shift, g.lon_shift)
    back = parse_ntv2(blob)
    assert (back.nrows, back.ncols) == (5, 4)
    assert back.s_lat == g.s_lat and back.w_long == g.w_long
    # float32 storage in the .gsb format
    assert np.allclose(back.lat_shift, g.lat_shift, atol=1e-3)
    assert np.allclose(back.lon_shift, g.lon_shift, atol=1e-3)


def test_ntv2_bilinear_exact_at_nodes_and_outside_passthrough():
    import numpy as np

    g = _nz_fixture_grid()
    # at a grid node the interpolation is exact
    lat0 = g.s_lat / 3600.0
    lon0 = -g.e_long / 3600.0
    lon_s, lat_s = g.shift(np.array([lon0]), np.array([lat0]))
    assert lat_s[0] - lat0 == pytest.approx(g.lat_shift[0, 0] / 3600.0, abs=1e-12)
    # a point far outside the grid passes through unshifted
    lon_o, lat_o = g.shift(np.array([10.0]), np.array([50.0]))
    assert lon_o[0] == 10.0 and lat_o[0] == 50.0


def test_datum_fallback_within_documented_tolerance_of_grid():
    """nzgd1949_to_nzgd2000 without a grid stays within
    FALLBACK_TOLERANCE_M of the grid path (here the grid encodes the
    fallback at nodes, so the gap is interpolation error only — the
    4 m constant documents the bound vs the real LINZ grid)."""
    import numpy as np

    from geospatial_etl_pipeline_spark.functions.datum import (
        FALLBACK_TOLERANCE_M,
        nzgd1949_to_nzgd2000,
    )

    g = _nz_fixture_grid()
    lons = np.array([172.5, 174.78, 168.3, 176.9])
    lats = np.array([-43.5, -41.29, -46.4, -37.8])
    glon, glat = nzgd1949_to_nzgd2000(lons, lats, grid=g)
    flon, flat = nzgd1949_to_nzgd2000(lons, lats, grid=False)
    # degrees -> meters (~111.3 km/deg lat; scale lon by cos(lat))
    dlat_m = np.abs(glat - flat) * 111_320.0
    dlon_m = np.abs(glon - flon) * 111_320.0 * np.cos(np.radians(lats))
    assert float(np.max(dlat_m)) < FALLBACK_TOLERANCE_M
    assert float(np.max(dlon_m)) < FALLBACK_TOLERANCE_M
    # and the shift itself is the physically expected ~150-220 m
    shift_m = np.hypot((glat - lats) * 111_320.0,
                       (glon - lons) * 111_320.0 * np.cos(np.radians(lats)))
    assert np.all(shift_m > 50.0) and np.all(shift_m < 400.0)


def test_default_grid_path_is_the_shipped_ntv2_fixture():
    """With no argument, nzgd1949_to_nzgd2000 resolves the SHIPPED
    synthetic .gsb (REF:301's NTv2 request) — inside the NZ window it
    agrees with the 3-param derivation to interpolation error (<5 cm,
    tightened from the 4 m no-grid bound); outside the window it falls
    back to the 3-param path exactly."""
    import numpy as np

    from geospatial_etl_pipeline_spark.functions.datum import (
        default_nz_grid,
        nzgd1949_to_nzgd2000,
    )

    assert default_nz_grid() is not None, "shipped .gsb fixture missing"
    rng = np.random.default_rng(7)
    lons = rng.uniform(166.1, 179.6, 500)
    lats = rng.uniform(-47.9, -34.1, 500)
    glon, glat = nzgd1949_to_nzgd2000(lons, lats)  # default = grid path
    flon, flat = nzgd1949_to_nzgd2000(lons, lats, grid=False)
    d_m = np.hypot((glon - flon) * 111_320.0 * np.cos(np.radians(lats)),
                   (glat - flat) * 111_320.0)
    assert float(np.max(d_m)) < 0.05
    # outside the grid window: exact 3-param fallback, never unshifted
    out = (np.array([150.0]), np.array([-20.0]))
    assert np.allclose(nzgd1949_to_nzgd2000(*out),
                       nzgd1949_to_nzgd2000(*out, grid=False), rtol=0, atol=0)


def test_lonlat_to_nztm_datum_hook():
    """The hook plugs into the NZTM projection: NZGD1949 input shifted
    through the datum hook lands ~100-300 m from the unshifted result."""
    import numpy as np

    from geospatial_etl_pipeline_spark.functions.datum import (
        nzgd1949_to_nzgd2000,
    )
    from geospatial_etl_pipeline_spark.functions.geometry import lonlat_to_nztm

    lon = np.array([174.7762])
    lat = np.array([-41.2865])
    e0, n0 = lonlat_to_nztm(lon, lat)
    e1, n1 = lonlat_to_nztm(lon, lat, datum_shift=nzgd1949_to_nzgd2000)
    d = float(np.hypot(e1 - e0, n1 - n0))
    assert 50.0 < d < 400.0


def test_datum_grid_true_rejected_and_miss_not_cached(tmp_path, monkeypatch):
    """grid=True is a type error, not a silent AttributeError; and a
    missing default-grid file must not be cached as a process-lifetime
    None (the fixture can be generated after first call)."""
    import numpy as np
    import pytest as _pytest

    from geospatial_etl_pipeline_spark.functions import datum

    with _pytest.raises(TypeError, match="grid=True"):
        datum.nzgd1949_to_nzgd2000(
            np.array([174.0]), np.array([-41.0]), grid=True
        )

    # point the default path at a not-yet-existing file: first call
    # falls back (no crash), then the file appears and is picked up
    missing = tmp_path / "later.gsb"
    monkeypatch.setattr(datum, "_DEFAULT_GRID_PATH", str(missing))
    monkeypatch.setattr(datum, "_default_grid_cache", [])
    assert datum.default_nz_grid() is None
    import shutil

    shutil.copy(
        "geospatial_etl_pipeline_spark/data/nz_nzgd49_nzgd2000_synth.gsb",
        missing,
    )
    assert datum.default_nz_grid() is not None


def test_grid_resolution_order(tmp_path, monkeypatch):
    """grid_search_paths honors env override → real LINZ grid →
    synthetic fixture. An unparseable DEFAULT candidate is skipped,
    never fatal — but an explicit $SPARK_GRAFT_NTV2_GRID that is
    missing or corrupt RAISES: the operator named that grid, and a
    silent fallback would degrade datum accuracy with no signal."""
    import pytest as _pytest

    from geospatial_etl_pipeline_spark.functions import datum

    paths = datum.grid_search_paths()
    assert paths[-2].endswith("nzgd2kgrid0005.gsb")  # real-grid slot
    assert paths[-1].endswith("nz_nzgd49_nzgd2000_synth.gsb")
    assert len(paths) == 2  # no env var set

    override = tmp_path / "cluster_grid.gsb"
    monkeypatch.setenv("SPARK_GRAFT_NTV2_GRID", str(override))
    assert datum.grid_search_paths()[0] == str(override)

    # missing env-pointed grid: loud failure, not silent degradation
    monkeypatch.setattr(datum, "_default_grid_cache", [])
    with _pytest.raises(ValueError, match="SPARK_GRAFT_NTV2_GRID"):
        datum.default_nz_grid()

    # corrupt env-pointed grid: same loud failure
    override.write_bytes(b"this is not an NTv2 file")
    monkeypatch.setattr(datum, "_default_grid_cache", [])
    with _pytest.raises(ValueError, match="SPARK_GRAFT_NTV2_GRID"):
        datum.default_nz_grid()

    # healthy env-pointed grid wins over the shipped fixture
    import shutil

    shutil.copy(
        "geospatial_etl_pipeline_spark/data/nz_nzgd49_nzgd2000_synth.gsb",
        override,
    )
    monkeypatch.setattr(datum, "_default_grid_cache", [])
    g = datum.default_nz_grid()
    assert g is not None


def test_real_linz_grid_tolerance_report_when_fetched():
    """When the build-time fetch hook (tools/fetch_linz_grid.py) has
    delivered the real LINZ grid, its tolerance report must confirm the
    documented FALLBACK_TOLERANCE_M still covers the measured max
    grid-vs-3-param gap. Skipped while the sandbox has no network; runs
    automatically the day the grid lands."""
    import json
    import os

    import pytest as _pytest

    from geospatial_etl_pipeline_spark.functions import datum

    report_path = os.path.join(
        os.path.dirname(datum._REAL_GRID_PATH), "ntv2_tolerance_report.json"
    )
    if not os.path.exists(datum._REAL_GRID_PATH):
        _pytest.skip("real LINZ grid not fetched (no network in sandbox)")
    assert os.path.exists(report_path), (
        "real grid present but no tolerance report — re-run "
        "tools/fetch_linz_grid.py"
    )
    with open(report_path) as f:
        report = json.load(f)
    assert report["within_documented_tolerance"], report
    assert (
        report["max_grid_vs_3param_m"]
        <= datum.FALLBACK_TOLERANCE_M
    ), report
