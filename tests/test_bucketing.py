"""Bucketed co-located join: zero exchanges, same results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_etl_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from geospatial_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    write_bucketed(o, "b_orders", "o_orderkey", 8, str(base / "o"))
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, str(base / "l"))
    yield o, li
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # at sf0.001 the planner would broadcast instead (which also skips
    # the shuffle but hides what we're testing); force the SMJ path the
    # join takes at real scale, where neither side broadcasts
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        j = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_matches_plain(spark, bucketed):
    o, li = bucketed
    plain = o.join(li, ["o_orderkey"])
    j = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
    assert sorted(map(tuple, j.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )
