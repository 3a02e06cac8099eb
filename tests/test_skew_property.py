"""Property-based tests: skew-mitigation joins are row-identical to the
plain joins they replace, on random (skewed, nullable) inputs.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geospatial_etl_pipeline_spark.operators.skew import (
    null_safe_skew_join,
    salted_join,
)

# few distinct keys => heavy collisions (the skew being mitigated)
KEY = st.integers(min_value=0, max_value=2)
NULLABLE_KEY = st.one_of(st.none(), KEY)


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    big=st.lists(st.tuples(KEY, st.integers(0, 9)), min_size=1, max_size=15),
    dim=st.lists(st.tuples(KEY, st.integers(0, 9)), max_size=6),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_row_identical(spark, big, dim, how):
    b = spark.createDataFrame(big, "k int, v int")
    d = spark.createDataFrame(dim or [(None, None)], "k int, w int").filter(
        "k IS NOT NULL"
    )
    got = salted_join(b, d, on=["k"], n_salts=4, how=how)
    want = b.join(d, ["k"], how)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got.select(*want.columns)) == _rows(want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(NULLABLE_KEY, st.integers(0, 9)),
                  min_size=1, max_size=15),
    right=st.lists(st.tuples(KEY, st.integers(0, 9)), max_size=6),
    how=st.sampled_from(["inner", "left"]),
)
def test_null_safe_join_row_identical(spark, left, right, how):
    l_df = spark.createDataFrame(left, "k int, v int")
    r_df = spark.createDataFrame(right or [(None, None)], "k int, w int").filter(
        "k IS NOT NULL"
    )
    got = null_safe_skew_join(l_df, r_df, on=["k"], how=how)
    want = l_df.join(r_df, ["k"], how)
    assert _rows(got.select(*want.columns)) == _rows(want)


# ---- LSH banding guarantee (dedup core promise) --------------------------


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=12, max_size=40),
        min_size=2, max_size=6, unique=True,
    ),
    dup_idx=st.integers(min_value=0, max_value=5),
)
def test_lsh_always_finds_exact_duplicates(spark, texts, dup_idx):
    """Identical documents share every minhash, hence every band bucket:
    LSH candidate generation can never miss them, and their verified
    Jaccard is exactly 1.0. (Near-dups may be missed probabilistically —
    exact dups must not be.)"""
    from hypothesis import assume

    from geospatial_etl_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    # need at least one multi-token doc to duplicate
    assume(any(len(t.split()) >= 3 for t in texts))
    eligible = [t for t in texts if len(t.split()) >= 3]
    dup_source = eligible[dup_idx % len(eligible)]
    rows = [(i, t) for i, t in enumerate(texts)]
    dup_id = len(rows)
    rows.append((dup_id, dup_source))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_candidate_pairs(
            df, num_hashes=8, bands=4, jaccard_threshold=0.99
        ).collect()
    }
    src_id = next(i for i, t in rows if t == dup_source)
    assert pairs.get((src_id, dup_id)) == 1.0
