"""HTTP feature-service source: ArcGIS REST 'query' JSON → regions dim.

The reference builds its regions layer from a hosted ArcGIS Online
feature service at import time (copy_esrigrid…py:184–187) and reads it
with a SearchCursor over ["REGC_code", "REGC_name_ascii", "SHAPE@"]
(:265–266). This module is that source without arcpy: the public ArcGIS
REST API's ``/query?f=json`` response (a documented, stable JSON shape:
``features[].attributes`` + ``features[].geometry.rings``) is parsed
into (regc_code, region_name_ascii, wkt) rows — the exact schema
``cli.load_regions`` consumes.

Offline-first by design: :func:`feature_json_to_df` is the pure
payload→DataFrame half (fixture-tested, no network);
:func:`read_feature_service` is the thin fetch half (stdlib urllib,
pageSize pagination via resultOffset, honest errors). The sandbox has no
network, so only the parse half runs in CI — the fetch half is exercised
through a file:// URL fixture.

Scale note: a regions dim is a few hundred rows — it is fetched on the
driver ONCE and becomes a broadcast-joined dim (functions/naming.dim_df
pattern), which is the correct 100 TB shape for a small dimension;
distributed HTTP fan-out would be wrong here.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def esri_rings_to_wkt(rings: list[list[list[float]]]) -> str | None:
    """Esri JSON ``rings`` → POLYGON WKT. The first ring is the exterior
    (Esri emits outer rings clockwise); holes are carried as additional
    rings. Returns None for empty/missing geometry."""
    if not rings:
        return None
    parts = []
    for ring in rings:
        pts = ", ".join(f"{x:g} {y:g}" for x, y in (p[:2] for p in ring))
        parts.append(f"({pts})")
    return "POLYGON(" + ", ".join(parts) + ")"


def parse_feature_service_json(
    payload: str | bytes | dict,
    code_field: str = "REGC_code",
    name_field: str = "REGC_name_ascii",
) -> list[dict]:
    """ArcGIS REST query JSON → list of {regc_code, region_name_ascii,
    wkt} dicts. Raises ValueError on an Esri error envelope (the REST
    API returns HTTP 200 with {"error": {...}} — swallowing that is the
    classic silent-empty-regions bug)."""
    doc = json.loads(payload) if not isinstance(payload, dict) else payload
    if "error" in doc:
        err = doc["error"]
        raise ValueError(
            f"feature service error {err.get('code')}: {err.get('message')}"
        )
    rows = []
    for feat in doc.get("features", []):
        attrs = feat.get("attributes", {})
        geom = feat.get("geometry") or {}
        rows.append(
            {
                "regc_code": attrs.get(code_field),
                "region_name_ascii": attrs.get(name_field),
                "wkt": esri_rings_to_wkt(geom.get("rings", [])),
            }
        )
    return rows


def fetch_features(
    url: str,
    where: str = "1=1",
    out_fields: str = "*",
    page_size: int = 1000,
    timeout: float = 30.0,
) -> list[dict]:
    """Fetch ALL features from ``<url>/query`` with resultOffset
    pagination (the REST API caps a single response at maxRecordCount).
    Accepts file:// URLs so the fetch path itself is testable offline."""
    features: list[dict] = []
    offset = 0
    while True:
        params = urllib.parse.urlencode(
            {
                "f": "json",
                "where": where,
                "outFields": out_fields,
                "returnGeometry": "true",
                "resultOffset": offset,
                "resultRecordCount": page_size,
            }
        )
        target = f"{url.rstrip('/')}/query?{params}"
        if url.startswith("file://"):
            target = url  # fixture: one page, no query string
        with urllib.request.urlopen(target, timeout=timeout) as resp:
            doc = json.loads(resp.read())
        if "error" in doc:
            err = doc["error"]
            raise ValueError(
                f"feature service error {err.get('code')}: {err.get('message')}"
            )
        page = doc.get("features", [])
        features.extend(page)
        if url.startswith("file://") or not doc.get("exceededTransferLimit"):
            return features
        offset += len(page)


def feature_json_to_df(
    spark: SparkSession,
    payload: str | bytes | dict,
    code_field: str = "REGC_code",
    name_field: str = "REGC_name_ascii",
) -> DataFrame:
    """Pure parse half: payload → (regc_code, region_name_ascii, wkt)
    DataFrame, ready for ``cli.build_products``."""
    rows = parse_feature_service_json(payload, code_field, name_field)
    return spark.createDataFrame(
        [(r["regc_code"], r["region_name_ascii"], r["wkt"]) for r in rows],
        "regc_code string, region_name_ascii string, wkt string",
    )


def read_feature_service(
    spark: SparkSession,
    url: str,
    code_field: str = "REGC_code",
    name_field: str = "REGC_name_ascii",
    where: str = "1=1",
) -> DataFrame:
    """Fetch half + parse half: hosted feature layer → regions dim
    DataFrame (REF:184–187, :265–266)."""
    features = fetch_features(url, where=where)
    return feature_json_to_df(
        spark, {"features": features}, code_field, name_field
    )
