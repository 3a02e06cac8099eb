"""Offline tests for the ArcGIS feature-service regions source."""

from __future__ import annotations

import json

import pytest

from geospatial_etl_pipeline_spark import cli
from geospatial_etl_pipeline_spark.sources.feature_service import (
    esri_rings_to_wkt,
    feature_json_to_df,
    parse_feature_service_json,
    read_feature_service,
)

FIXTURE = {
    "features": [
        {
            "attributes": {
                "REGC_code": "01",
                "REGC_name_ascii": "Northland Region",
            },
            "geometry": {"rings": [[[0, 0], [10, 0], [10, 6], [0, 6], [0, 0]]]},
        },
        {
            "attributes": {
                "REGC_code": "09",
                "REGC_name_ascii": "Wellington Region",
            },
            "geometry": {
                "rings": [
                    [[2, 2], [8, 2], [8, 9], [2, 9], [2, 2]],
                    [[4, 4], [5, 4], [5, 5], [4, 5], [4, 4]],  # hole
                ]
            },
        },
        {
            "attributes": {
                "REGC_code": "99",
                "REGC_name_ascii": "Area Outside Region",
            },
            "geometry": {"rings": []},
        },
    ]
}


def test_esri_rings_to_wkt_exterior_and_hole():
    wkt = esri_rings_to_wkt(FIXTURE["features"][1]["geometry"]["rings"])
    assert wkt.startswith("POLYGON((2 2, 8 2, 8 9, 2 9, 2 2), (4 4,")
    assert esri_rings_to_wkt([]) is None


def test_parse_feature_service_json_rows():
    rows = parse_feature_service_json(json.dumps(FIXTURE))
    assert [r["regc_code"] for r in rows] == ["01", "09", "99"]
    assert rows[0]["region_name_ascii"] == "Northland Region"
    assert rows[0]["wkt"] == "POLYGON((0 0, 10 0, 10 6, 0 6, 0 0))"
    assert rows[2]["wkt"] is None  # empty geometry survives as NULL


def test_parse_feature_service_error_envelope():
    with pytest.raises(ValueError, match="feature service error 400"):
        parse_feature_service_json(
            {"error": {"code": 400, "message": "Invalid query"}}
        )


def test_feature_json_to_df_schema(spark):
    df = feature_json_to_df(spark, FIXTURE)
    assert df.columns == ["regc_code", "region_name_ascii", "wkt"]
    assert df.count() == 3


def test_read_feature_service_file_url(spark, tmp_path):
    fx = tmp_path / "regions.json"
    fx.write_text(json.dumps(FIXTURE))
    df = read_feature_service(spark, f"file://{fx}")
    got = {r["regc_code"]: r for r in df.collect()}
    assert set(got) == {"01", "09", "99"}
    assert got["01"]["wkt"].startswith("POLYGON((0 0")


def test_cli_regions_from_feature_service(spark, tmp_path):
    """The CLI accepts the feature service as its regions source and
    produces the same products as the CSV path (REF builds its layer
    from the hosted service at import time; here it's an honored flag)."""
    from geospatial_etl_pipeline_spark.sources.asc import write_asc

    src = tmp_path / "grids"
    src.mkdir()
    cells = [float(v % 30) for v in range(100)]
    write_asc(str(src / "vcsn_01_x_y_mean_annual.asc"), 10, 10, cells)
    fx = tmp_path / "regions.json"
    fx.write_text(json.dumps(FIXTURE))

    out = tmp_path / "out"
    result = cli.run(
        spark, str(src), str(out), regions_url=f"file://{fx}"
    )
    # 1 grid x 2 regions with geometry... region 99 is excluded by the
    # skip-99 predicate; its NULL wkt row never reaches the clip
    assert result["products"] == 2
    assert result["zips"] == 2
