"""Differential tests: every catalog query vs its DuckDB oracle.

This replicates the driver's t2 gate locally (at sf0.001 by default for
speed; set GEOETL_TEST_SF_DIR=/root/testdata/sf0.01 for the full gate).
"""

from __future__ import annotations

import os

import pytest

from geospatial_etl_pipeline_spark.oracle import compare
from geospatial_etl_pipeline_spark.plans import catalog

catalog.load_all_plans()

SF_DIR = os.environ.get("GEOETL_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_SPECS = sorted(
    (name, spec) for name, spec in catalog.QUERIES.items() if spec.oracle
)


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_parity(spark, name, spec):
    res = compare(name, spark, SF_DIR, spec.fn, spec.oracle)
    assert res.ok, str(res)


NO_ORACLE_SPECS = sorted(
    (name, spec) for name, spec in catalog.QUERIES.items() if spec.oracle is None
)


@pytest.mark.parametrize("name,spec", NO_ORACLE_SPECS, ids=[n for n, _ in NO_ORACLE_SPECS])
def test_rows_only(spark, name, spec):
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
