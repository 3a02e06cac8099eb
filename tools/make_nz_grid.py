#!/usr/bin/env python
"""Build the shipped synthetic NZ NTv2 fixture.

The real LINZ grid (nzgd2kgrid0005.gsb) is not available offline, so we
ship a synthetic single-subgrid ``.gsb`` whose node shifts are the
published 3-parameter NZGD1949→NZGD2000 geocentric translation evaluated
at each node (0.25° spacing over the NZ window, lat -48..-34,
lon 166..179.75). The file is byte-for-byte the public NTv2 format, so
the real LINZ grid drops in at the same path with no code change; until
then the grid path and the 3-param path agree to interpolation error
(<1 cm — the shift field is smooth), which the tests pin.

Deterministic: same inputs → same bytes. Run from the repo root:
    python tools/make_nz_grid.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geospatial_etl_pipeline_spark.functions.datum import (  # noqa: E402
    _DEFAULT_GRID_PATH,
    _three_param_shift,
    make_ntv2_bytes,
)

# NZ window, east-positive degrees
LAT_MIN, LAT_MAX = -48.0, -34.0
LON_MIN, LON_MAX = 166.0, 179.75
STEP = 0.25  # degrees; the shift field is smooth enough that bilinear
# interpolation at this spacing is sub-centimeter


def main() -> None:
    lats = np.arange(LAT_MIN, LAT_MAX + STEP / 2, STEP)
    lons = np.arange(LON_MIN, LON_MAX + STEP / 2, STEP)
    # NTv2 layout: rows south→north, columns east→west (positive-west
    # longitude increasing) — so column 0 is the EASTERNMOST longitude.
    LON, LAT = np.meshgrid(lons[::-1], lats)  # (nrows, ncols)
    lon2, lat2 = _three_param_shift(LON.ravel(), LAT.ravel())
    lat_shift_sec = (lat2 - LAT.ravel()) * 3600.0
    # positive-west: shift_w = -(delta east-positive)
    lon_shift_sec_w = -(lon2 - LON.ravel()) * 3600.0
    blob = make_ntv2_bytes(
        s_lat=LAT_MIN * 3600.0, n_lat=LAT_MAX * 3600.0,
        e_long=-LON_MAX * 3600.0, w_long=-LON_MIN * 3600.0,
        lat_inc=STEP * 3600.0, long_inc=STEP * 3600.0,
        lat_shift=lat_shift_sec, lon_shift=lon_shift_sec_w,
    )
    os.makedirs(os.path.dirname(_DEFAULT_GRID_PATH), exist_ok=True)
    with open(_DEFAULT_GRID_PATH, "wb") as f:
        f.write(blob)
    print(f"wrote {_DEFAULT_GRID_PATH}: {len(blob)} bytes, "
          f"{lats.size}x{lons.size} nodes")


if __name__ == "__main__":
    main()
