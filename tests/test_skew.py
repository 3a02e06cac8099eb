"""Salted / null-safe skew joins must be row-identical to plain joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_etl_pipeline_spark.operators.skew import (
    null_safe_skew_join,
    salted_join,
)
from geospatial_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).withColumnRenamed("c_custkey", "o_custkey")


def _sorted_rows(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_salted_inner_matches_plain(orders, customer):
    plain = orders.join(customer, ["o_custkey"], "inner")
    salted = salted_join(orders, customer, ["o_custkey"], n_salts=8)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_left_matches_plain(spark, orders, customer):
    # poke holes in the dimension so unmatched-left rows exist
    dim = customer.filter(F.col("o_custkey") % 3 != 0)
    plain = orders.join(dim, ["o_custkey"], "left")
    salted = salted_join(orders, dim, ["o_custkey"], n_salts=8, how="left")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_spreads_hot_key(spark, orders, customer):
    # every row the same key -> plain join puts all rows in one task;
    # salted spreads them across n_salts partitions of the join key space
    hot = orders.withColumn("o_custkey", F.lit(7).cast("long"))
    dim = customer.filter(F.col("o_custkey") == 7)
    n = hot.count()
    out = salted_join(hot, dim, ["o_custkey"], n_salts=8)
    assert out.count() == n * dim.count()


def test_null_safe_inner_and_left(spark, orders, customer):
    with_nulls = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
            F.col("o_custkey")
        ),
    )
    for how in ("inner", "left"):
        plain = with_nulls.join(customer, ["o_custkey"], how)
        fast = null_safe_skew_join(with_nulls, customer, ["o_custkey"], how)
        assert _sorted_rows(fast.select(*plain.columns)) == _sorted_rows(plain)
