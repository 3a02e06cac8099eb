"""Unit tests: brute-force vs LSH-ANN similarity operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_etl_pipeline_spark.operators.similarity import (
    auto_block_bits,
    brute_force_topk,
    embedding_near_dup,
    ivf_topk,
    lsh_ann_topk,
)
from geospatial_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return (
        corpus.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
        .cache()
    )


def test_brute_force_topk_self_is_best(corpus, queries):
    top = brute_force_topk(corpus, queries, k=5).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rn"])
        assert rows[0]["vec_id"] == qid  # self-similarity = 1.0 tops
        assert rows[0]["cosine_sim"] == pytest.approx(1.0)
        sims = [r["cosine_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) == 5


def test_ivf_topk_recall_against_brute_force(corpus, queries):
    exact = brute_force_topk(corpus, queries, k=5).collect()
    approx = ivf_topk(corpus, queries, k=5, ncells=8, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid, ex in exact_sets.items():
        ap = approx_sets.get(qid, set())
        # self vector lives in the query's own nearest cell by construction
        assert qid in ap
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.4, f"query {qid} recall {recall}"
        # probed fraction really is partial: candidates < corpus
        assert len(ap) <= 5


def test_lsh_ann_recall_against_brute_force(corpus, queries):
    exact = brute_force_topk(corpus, queries, k=5).collect()
    approx = lsh_ann_topk(corpus, queries, k=5, nbits=6, ntables=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    # every query must at least recover itself + meaningful overlap
    for qid, ex in exact_sets.items():
        ap = approx_sets.get(qid, set())
        assert qid in ap
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.4, f"query {qid} recall {recall}"


def test_lsh_candidates_are_subset_scored(corpus, queries):
    approx = lsh_ann_topk(corpus, queries, k=1000, nbits=10, ntables=2)
    n_cand = approx.count()
    n_total = corpus.count() * 3
    assert 0 < n_cand < n_total  # pruning actually happened


def test_auto_block_bits_keeps_pairs_linear():
    # 2^nbits ≈ n/16 ⇒ expected pairs ≈ 8n; never below the floor
    assert auto_block_bits(10) == 6
    assert auto_block_bits(1 << 20) == 16
    assert auto_block_bits(1 << 30) == 26


def test_embedding_near_dup_matches_quadratic_reference(spark, corpus):
    """Blocked+thresholded near-dup == the quadratic spec restricted to
    same-block pairs, on a corpus where planted near-dups exist."""
    import math

    base = corpus.limit(40).collect()
    rows, planted = [], []
    for r in base:
        rows.append((r["vec_id"], [float(x) for x in r["embedding"]]))
    # plant exact near-dups: copy of each of the first 5 vectors with a
    # tiny same-sign perturbation → cosine ≈ 1, same sign block
    for i in range(5):
        vid, v = rows[i]
        planted.append((10_000 + vid, [x * 1.001 for x in v]))
    df = spark.createDataFrame(rows + planted, ["vec_id", "embedding"])

    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup(df, nbits=6, threshold=0.95).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a)) / math.sqrt(sum(x * x for x in b))

    def blk(v):
        return tuple(x >= 0 for x in v[:6])

    data = rows + planted
    want = {
        (a[0], b[0])
        for i, a in enumerate(data)
        for b in data[i + 1 :]
        if blk(a[1]) == blk(b[1]) and cos(a[1], b[1]) >= 0.95
    }
    want = {(min(p), max(p)) for p in want}
    assert got == want
    assert len(want) >= 5  # the planted dups were actually found


def test_embedding_near_dup_threshold_below_topk(spark, corpus):
    """topk applies AFTER the threshold: raising τ can only shrink the
    result, never let a sub-threshold pair into the top-k."""
    lo = embedding_near_dup(corpus, nbits=4, threshold=-1.0, topk=50).collect()
    hi = embedding_near_dup(corpus, nbits=4, threshold=0.3, topk=50).collect()
    assert all(r["cosine_sim"] >= 0.3 for r in hi)
    hi_pairs = {(r["id_a"], r["id_b"]) for r in hi}
    lo_top = {(r["id_a"], r["id_b"]) for r in lo if r["cosine_sim"] >= 0.3}
    assert hi_pairs.issuperset(lo_top)


def test_q121_kernel_rejects_ragged_dims(spark, tmp_path):
    """temb validates elements but not uniform dimensionality (q202
    audits n_distinct_dims > 1 as an ingest defect); the SemDeDup
    applyInPandas kernel must name that precondition instead of dying
    in np.stack with an opaque shape error (r7 advice finding)."""
    import duckdb as _duck

    from geospatial_etl_pipeline_spark.plans import catalog

    catalog.load_all_plans()
    d = str(tmp_path / "ragged")
    import os as _os
    _os.makedirs(d, exist_ok=True)
    con = _duck.connect()
    con.execute(
        f"""COPY (
          SELECT unnest(range(40)) AS vec_id,
                 list_transform(range(8), i -> 0.1::FLOAT * (i + 1)) AS embedding,
                 0 AS label
          UNION ALL
          SELECT 98, list_transform(range(5), i -> 0.2::FLOAT * (i + 1)), 1
          UNION ALL
          SELECT 99, list_transform(range(6), i -> 0.3::FLOAT * (i + 1)), 1
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as ei:
        catalog.QUERIES["q121_semantic_dedup"].fn(spark, d).collect()
    assert "uniform embedding dimensionality" in str(ei.value)


def test_ivf_cell_near_dup_one_cell_is_exact(spark, corpus):
    """With ncells=1 every pair is a candidate, so the IVF-cell blocked
    near-dup must EQUAL the exact quadratic pair set — the blocking can
    only ever remove candidates, never alter a surviving pair's cosine."""
    import math

    from geospatial_etl_pipeline_spark.operators.similarity import (
        ivf_cell_near_dup,
    )

    df = corpus.limit(30)
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]])
            for r in df.collect()]
    got = {
        (r["id_a"], r["id_b"])
        for r in ivf_cell_near_dup(df, ncells=1, threshold=0.3).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return (d / math.sqrt(sum(x * x for x in a))
                / math.sqrt(sum(x * x for x in b)))

    want = {
        (min(a[0], b[0]), max(a[0], b[0]))
        for i, a in enumerate(rows) for b in rows[i + 1:]
        if cos(a[1], b[1]) >= 0.3
    }
    assert got == want and len(want) > 0


def test_ivf_cell_near_dup_subset_of_exact_and_multiassign_recall(
    spark, corpus
):
    """Blocked pairs are always a SUBSET of the exact threshold set,
    and nassign=2 can only add pairs (boundary-recall mitigation),
    each reported once despite shared cells."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        ivf_cell_near_dup,
    )

    df = corpus.limit(60)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ivf_cell_near_dup(df, ncells=1, threshold=0.3).collect()
    }
    one = [(r["id_a"], r["id_b"])
           for r in ivf_cell_near_dup(df, ncells=8, threshold=0.3).collect()]
    two = [(r["id_a"], r["id_b"])
           for r in ivf_cell_near_dup(df, ncells=8, threshold=0.3,
                                      nassign=2).collect()]
    assert set(one) <= exact
    assert set(two) <= exact
    assert set(one) <= set(two)
    assert len(two) == len(set(two))  # deduped despite 2 assignments


def test_hierarchical_cell_near_dup_fanout1_is_exact(spark, corpus):
    """fanout=1 collapses both levels to a single leaf, so the
    two-level blocked near-dup must EQUAL the exact quadratic pair set
    — and because both operators quantize identically, the surviving
    pairs' cosines must be bit-identical to the flat path's."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        hierarchical_cell_near_dup,
        ivf_cell_near_dup,
    )

    df = corpus.limit(30)
    flat = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in ivf_cell_near_dup(df, ncells=1, threshold=0.3).collect()
    }
    hier = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in hierarchical_cell_near_dup(
            df, fanout=1, threshold=0.3
        ).collect()
    }
    assert hier == flat and len(flat) > 0  # sets AND bit-equal cosines


def test_hierarchical_cell_near_dup_subset_and_recall(spark, corpus):
    """Two-level blocked pairs are a SUBSET of the exact threshold set;
    nassign=2 (applied at both levels) can only add pairs, each
    reported once; and the leaf blocking is at least as fine as its
    own level-1 blocking (a pair sharing a leaf shares the L1 cell by
    construction)."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        hierarchical_cell_near_dup,
        ivf_cell_near_dup,
    )

    df = corpus.limit(60)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ivf_cell_near_dup(df, ncells=1, threshold=0.3).collect()
    }
    one = [
        (r["id_a"], r["id_b"])
        for r in hierarchical_cell_near_dup(
            df, fanout=3, threshold=0.3
        ).collect()
    ]
    two = [
        (r["id_a"], r["id_b"])
        for r in hierarchical_cell_near_dup(
            df, fanout=3, threshold=0.3, nassign=2
        ).collect()
    ]
    assert set(one) <= exact
    assert set(two) <= exact
    assert set(one) <= set(two)
    assert len(one) == len(set(one))
    assert len(two) == len(set(two))


def test_hierarchical_auto_fanout_cube_root_dial():
    from geospatial_etl_pipeline_spark.operators.similarity import (
        auto_fanout,
    )

    assert auto_fanout(10) == 4              # floor
    assert auto_fanout(1_000_000) == 100     # n^(1/3), exact
    assert auto_fanout(1_000_000_000) == 1000
    # exact integer cube root, never a float round-up: 500^(1/3) ≈ 7.94
    # rounds to 8 but 8³ = 512 > 500 — the dial must say 7 (what the
    # SQL oracle's MAX(f) WHERE f*f*f <= n computes)
    assert auto_fanout(500) == 7
    assert auto_fanout(512) == 8
    assert auto_fanout(511) == 7
