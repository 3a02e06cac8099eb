"""Unit tests: brute-force vs LSH-ANN similarity operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
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
