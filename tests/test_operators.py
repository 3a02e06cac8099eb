"""Unit tests: as-of join, dedup operators, naming semantics, multimodal."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from geospatial_etl_pipeline_spark.operators.asof import asof_join
from geospatial_etl_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01T10:00:00")),
            (2, "u1", ts("2024-01-01T12:00:00")),
            (3, "u2", ts("2024-01-01T09:00:00")),
        ],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01T09:30:00"), 100.0),
            ("u1", ts("2024-01-01T11:00:00"), 200.0),
            ("u1", ts("2024-01-01T13:00:00"), 300.0),
            ("u2", ts("2024-01-01T09:00:00"), 400.0),  # equal ts: inclusive
        ],
        ["user", "ts", "price"],
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on=["user"], ts="ts", right_payload=["price"],
            include_right_count=True,
        ).collect()
    }
    assert out[1]["asof_price"] == 100.0 and out[1]["n_right_before"] == 1
    assert out[2]["asof_price"] == 200.0 and out[2]["n_right_before"] == 2
    # equal-timestamp right row counts (inclusive semantics)
    assert out[3]["asof_price"] == 400.0 and out[3]["n_right_before"] == 1


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame([(1, "u9", ts("2024-01-01T10:00:00"))],
                                 ["event_id", "user", "ts"])
    right = spark.createDataFrame(
        [("u9", ts("2024-01-02T00:00:00"), 1.0)], ["user", "ts", "price"]
    )
    row = asof_join(left, right, ["user"], "ts", ["price"]).collect()[0]
    assert row["asof_price"] is None


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),  # same fingerprint (case/whitespace fold)
            (3, "goodbye"),
        ],
        ["doc_id", "text"],
    )
    rows = exact_dedup_groups(df).collect()
    by_keeper = {r["keeper_doc_id"]: r for r in rows}
    assert by_keeper[1]["n_copies"] == 2
    assert by_keeper[3]["n_copies"] == 1


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text with other shingles entirely")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)]
            for r in minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base + " xx"), (3, "unrelated words entirely here")],
        ["doc_id", "text"],
    )
    pairs = lsh_candidate_pairs(df, jaccard_threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == (1, 2) and p["jaccard"] > 0.8


def test_naming_semantics(spark):
    from geospatial_etl_pipeline_spark.functions.naming import (
        parse_base_name,
        product_name,
        region_title,
    )

    df = spark.createDataFrame(
        [("grid_02_a_b_mean_monthly7", "Wellington Region"),
         ("vcsn_00_x_y_max_annual", "Area Outside Region")],
        ["base_name", "name_ascii"],
    )
    parsed = parse_base_name(F.col("base_name"))
    rows = df.select(
        *[c.alias(n) for n, c in parsed.items()],
        region_title(F.col("name_ascii")).alias("title"),
        product_name(F.lit("Mean-Air-Temperature"), parsed["statistic"],
                     F.lit("July")).alias("product"),
    ).collect()
    r0, r1 = rows
    assert (r0["parameter_code"], r0["statistic"], r0["period_key"]) == (
        "02", "mean", "monthly7")
    assert r0["title"] == "Wellington"
    assert r0["product"] == "Mean-Air-Temperature_mean_1991-2020_July"
    assert (r1["parameter_code"], r1["statistic"], r1["period_key"]) == (
        "00", "max", "annual")
    assert r1["title"] == "Chatham Islands"


def test_multimodal_fake_decode_plumbing(spark, sf_dir):
    from geospatial_etl_pipeline_spark.operators.multimodal import (
        decode_features,
        synthesize_media,
    )
    from geospatial_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = synthesize_media(docs)
    with pytest.raises(NotImplementedError):
        decode_features(media)  # codecs absent -> explicit stub error
    feats = decode_features(media, dims=8, allow_fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])
    # determinism: same blob -> same hash/features
    again = {r["media_id"]: r["content_hash"]
             for r in decode_features(media, dims=8, allow_fake=True).collect()}
    assert all(again[r["media_id"]] == r["content_hash"] for r in rows)
