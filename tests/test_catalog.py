"""Catalog registry consistency checks (no Spark session needed)."""

from __future__ import annotations

from geospatial_etl_pipeline_spark.plans import catalog

catalog.load_all_plans()


def test_oracle_twins_resolve():
    for name, spec in catalog.QUERIES.items():
        if spec.oracle_twin is not None:
            assert spec.oracle is None, f"{name}: twin only for rows-only entries"
            twin = catalog.QUERIES.get(spec.oracle_twin)
            assert twin is not None, f"{name}: unknown twin {spec.oracle_twin}"
            assert twin.oracle is not None, f"{name}: twin has no oracle"


def test_no_oracle_set_is_documented():
    """Every rows-only entry is either inherently un-SQL-able (q29
    sketches, q74 side-effecting e2e) or twinned to a hash-checked
    companion. New no-oracle entries must join one of those lists."""
    inherent = {"q29_sketch_aggregates", "q74_ref_pipeline_e2e"}
    for name, spec in catalog.QUERIES.items():
        if spec.oracle is None:
            assert name in inherent or spec.oracle_twin, name
