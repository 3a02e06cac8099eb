"""Property-based test: asof_join vs the brute-force quadratic spec.

hypothesis generates small random (key, ts) event sets; the operator's
union+window formulation must match "for every left row, the max right
ts at-or-before it, and how many right rows precede (inclusive)" exactly
— including empty sides, all-ties, and keys present on only one side.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geospatial_etl_pipeline_spark.operators.asof import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),  # user_id: few keys => collisions
    st.integers(min_value=0, max_value=20),  # ts: small range => ties
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left_rows=st.lists(ROW, min_size=1, max_size=12),
    right_rows=st.lists(ROW, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(left_rows)],
        "event_id int, user_id int, ts int",
    )
    right = spark.createDataFrame(
        [(u, ts, ts) for u, ts in right_rows] or [(None, None, None)],
        "user_id int, ts int, payload int",
    ).filter("user_id IS NOT NULL")
    got = {
        r["event_id"]: (r["asof_payload"], r["n_right_before"])
        for r in asof_join(
            left,
            right,
            on=["user_id"],
            ts="ts",
            right_payload=["payload"],
            include_right_count=True,
        ).collect()
    }
    for i, (u, ts) in enumerate(left_rows):
        before = [rts for ru, rts in right_rows if ru == u and rts <= ts]
        expected = (max(before) if before else None, len(before))
        assert got[i] == expected, (i, u, ts, got[i], expected)


# ---- sessionization (q62 semantics) --------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=st.lists(ROW, min_size=1, max_size=20))
def test_sessionize_matches_bruteforce(spark, events):
    """30-unit-gap sessionization (lag + flag-sum) vs the obvious python
    spec: sort each user's times, count gaps > threshold. Ties in ts are
    broken by event_id in both — boundary gap == threshold starts NO new
    session (strict >)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    gap = 30
    df = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(events)],
        "event_id int, user_id int, ts int",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = df.select(
        "user_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > gap),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    got = {
        r["user_id"]: r["n"]
        for r in flagged.groupBy("user_id")
        .agg(F.sum("new_session").alias("n"))
        .collect()
    }
    expect = {}
    for u in {u for u, _ in events}:
        ts_sorted = sorted(ts for uu, ts in events if uu == u)
        n = 1 + sum(
            1
            for a, b in zip(ts_sorted, ts_sorted[1:])
            if b - a > gap
        )
        expect[u] = n
    assert got == expect


def test_asof_join_ts_tie_is_deterministic(spark):
    """Right rows sharing (key, ts) with different payloads: the
    documented tie policy (greatest payload struct wins) holds, and the
    result is identical across input partitionings."""
    from pyspark.sql import functions as F

    from geospatial_etl_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 50), (2, 100)], ["k", "ts"]
    )
    right_rows = [
        (1, 100, "b", 7.0), (1, 100, "a", 9.0), (1, 100, "c", 1.0),
        (1, 40, "z", 2.0),
        (2, 100, "m", 5.0), (2, 100, "m", 4.0),
    ]
    results = []
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(
            right_rows, ["k", "ts", "tag", "score"]
        ).repartition(nparts)
        out = asof_join(left, right, on=["k"], ts="ts",
                        right_payload=["tag", "score"])
        results.append(
            sorted((r["k"], r["ts"], r["asof_tag"], r["asof_score"])
                   for r in out.collect())
        )
    assert results[0] == results[1] == results[2]
    by = {(k, ts): (tag, sc) for k, ts, tag, sc in results[0]}
    # greatest struct (tag, score): ('c', 1.0) > ('b', 7.0) > ('a', 9.0)
    assert by[(1, 100)] == ("c", 1.0)
    assert by[(1, 50)] == ("z", 2.0)   # no tie: ordinary at-or-before
    assert by[(2, 100)] == ("m", 5.0)  # tag tie -> greater score wins
