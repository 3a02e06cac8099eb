"""Similarity-search queries over ``embeddings`` (SURVEY §2j [EXT]).

Brute-force cosine top-k is the exact baseline; the scale path
(LSH-bucketed ANN) lives in ``operators.similarity``.

Numeric determinism: embedding math produces full-mantissa doubles, so
reductions use the floor-quantized integer sum (``_util.qsum``) — the
only construction that is bit-identical across Spark and DuckDB for
arbitrary doubles (see _util docstring). Scale 12 keeps |x*y|·10^12
well under 2^53 for unit-normalized vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import qsum, sql_qsum, t
from .catalog import register

_QUERY_VEC_ID = 0
_S = float(10**12)  # quantization rescale factor


@register(
    "q50_cosine_topk",
    tags=("similarity", "llm-data", "topk"),
    oracle=f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> {_QUERY_VEC_ID}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
prod AS (
  SELECT e.vec_id,
         e.embedding[i::INT]::DOUBLE AS x,
         qv[i::INT]::DOUBLE AS y
  FROM e, q, unnest(range(1, len(e.embedding) + 1)) t(i)
),
agg AS (
  SELECT vec_id,
         CAST({sql_qsum('x * y')} AS DOUBLE) / {_S!r} AS dot,
         CAST({sql_qsum('x * x')} AS DOUBLE) / {_S!r} AS na,
         CAST({sql_qsum('y * y')} AS DOUBLE) / {_S!r} AS nq
  FROM prod GROUP BY vec_id
)
SELECT vec_id, dot / (sqrt(na) * sqrt(nq)) AS cosine_sim
FROM agg
ORDER BY cosine_sim DESC, vec_id ASC
LIMIT 10
""",
)
def q50_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 against the query vector
    (vec_id=0). Broadcast query side; one aggregation shuffle on vec_id;
    TakeOrdered top-k — the pattern scales to |corpus| × small-query-set."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(F.col("v").alias("qv"))
    prods = (
        e.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.posexplode("v").alias("i", "x"), F.col("qv"))
        .select("vec_id", "x", F.element_at("qv", F.col("i") + 1).alias("y"))
    )
    agg = prods.groupBy("vec_id").agg(
        (qsum(F.col("x") * F.col("y")).cast("double") / F.lit(_S)).alias("dot"),
        (qsum(F.col("x") * F.col("x")).cast("double") / F.lit(_S)).alias("na"),
        (qsum(F.col("y") * F.col("y")).cast("double") / F.lit(_S)).alias("nq"),
    )
    return (
        agg.select(
            "vec_id",
            (F.col("dot") / (F.sqrt("na") * F.sqrt("nq"))).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "q51_label_centroids",
    tags=("similarity", "llm-data", "agg"),
    oracle=f"""
SELECT label, i::INT AS dim,
       CAST({sql_qsum('embedding[i::INT]::DOUBLE')} AS DOUBLE) / {_S!r} / COUNT(*)
         AS centroid
FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)
GROUP BY label, i
""",
)
def q51_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension). Explode +
    hash-agg: partial aggregation makes the shuffle carry
    |labels|×dim rows regardless of corpus size."""
    e = t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("i", "x"))
    return ex.groupBy("label", (F.col("i") + 1).cast("int").alias("dim")).agg(
        (qsum(F.col("x")).cast("double") / F.lit(_S) / F.count(F.lit(1))).alias(
            "centroid"
        )
    )


@register(
    "q52_norm_stats_per_label",
    tags=("similarity", "llm-data", "agg"),
    oracle=f"""
WITH norms AS (
  SELECT label, vec_id,
         sqrt(CAST({sql_qsum('embedding[i::INT]::DOUBLE * embedding[i::INT]::DOUBLE')}
              AS DOUBLE) / {_S!r}) AS l2
  FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)
  GROUP BY label, vec_id
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST({sql_qsum('l2', 9)} AS DOUBLE) / 1000000000.0 / COUNT(*) AS avg_norm,
       MIN(l2) AS min_norm,
       MAX(l2) AS max_norm
FROM norms GROUP BY label
""",
)
def q52_norm_stats_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregate: per-vector L2 norm, then per-label stats."""
    e = t(spark, sf_dir, "embeddings").select(
        "label", "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norms = (
        e.select("label", "vec_id", F.explode("v").alias("x"))
        .groupBy("label", "vec_id")
        .agg(
            F.sqrt(
                qsum(F.col("x") * F.col("x")).cast("double") / F.lit(_S)
            ).alias("l2")
        )
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            qsum(F.col("l2"), scale=9).cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1))
        ).alias("avg_norm"),
        F.min("l2").alias("min_norm"),
        F.max("l2").alias("max_norm"),
    )
