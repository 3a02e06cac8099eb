"""Iterative k-means (Lloyd's algorithm) over an embedding column.

The iterative-algorithm family beyond connected components
(operators/graph.py): q56's IVF quantizer runs exactly ONE
assign-to-sampled-centroids step; this operator runs the full
assign → recompute loop, expressed entirely as DataFrame ops so every
iteration is a distributed job:

- **init**: deterministic md5-ranked sample of k corpus vectors (the
  same content-addressed pick as IVF's quantizer — no rand(), stable
  across runs/reshuffles).
- **assign**: centroids broadcast; each row computes argmin squared
  distance with an in-row fold over the k-element centroid array
  (pure JVM higher-order functions — no explode, no |corpus|×k
  shuffle, no Python).
- **recompute**: groupBy(cluster) with per-dimension mean via
  ``posexplode`` + hash agg — partial-aggregable, one shuffle keyed on
  (cluster, dim). Empty clusters keep their previous centroid.
- **lineage**: each iteration's centroids are a ~k-row LOCAL result
  (collected to the driver as plain floats — k·d values, not data), so
  there is no growing lineage to checkpoint and iteration i+1's plan
  is independent of iteration i's.

At 100 TB: the corpus is scanned once per iteration (the irreducible
cost of Lloyd's), the only shuffle is the (cluster, dim) partial agg,
and the broadcast payload is k·d doubles. Determinism: each row's
assignment is an exact argmin over per-row IEEE double arithmetic with
index tiebreak, and the recomputed means use exact DECIMAL sums — so
the whole trajectory is reproducible run-to-run (asserted in
tests/test_operators.py along with monotone non-increasing inertia,
Lloyd's algorithm's defining invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _md5_rank(col):
    return F.md5(F.concat(F.lit("kmeans:"), col.cast("string")))


def init_centroids(corpus: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic k-row init: the k corpus vectors ranking smallest
    under md5('kmeans:'||id). TakeOrdered (partial top-k) — no full
    sort, no rand()."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(_md5_rank(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    return [list(r[1]) for r in rows]


def assign_clusters(corpus: DataFrame, centroids: list[list[float]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, dist2): argmin squared euclidean distance to the
    broadcast centroid list, computed as ONE in-row fold over the
    centroid array literal — index breaks ties, scan-side only."""
    v = F.col(vec_col).cast("array<double>")
    if not centroids:
        # Zero-row corpus (r9 all_empty fixture): init_centroids sampled
        # nothing, and an empty F.lit([]) literal cannot be typed as
        # array<array<double>> — the zip_with below fails analysis. The
        # assignment relation is definitionally empty with no centroids,
        # so return it with the exact output schema.
        return corpus.select(
            F.col(id_col),
            v.alias("_v"),
            F.lit(None).cast("int").alias("cluster"),
            F.lit(None).cast("double").alias("dist2"),
        ).limit(0)
    cents = F.lit(centroids)  # array<array<double>> literal, broadcast-by-plan
    # Each centroid distance is computed EXACTLY ONCE (transform to
    # (d2, cl) structs), then the argmin fold compares precomputed
    # scalars — folding dist2() calls directly re-evaluates the whole
    # distance subtree per reference (the q236/tokens() Catalyst trap;
    # this operator feeds q114/q118/q121/q160, so the 2x was paid by
    # the entire k-means family). Strict < keeps the FIRST minimum, so
    # the lowest-index tiebreak is unchanged.
    dists = F.transform(
        F.zip_with(cents, F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                   lambda c, i: F.struct(c.alias("c"), i.alias("i"))),
        lambda ci: F.struct(
            F.aggregate(
                F.zip_with(v, ci["c"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda a, b: a + b,
            ).alias("d2"),
            ci["i"].alias("cl"),
        ),
    )
    best = F.aggregate(
        dists,
        F.struct(
            F.lit(float("inf")).alias("d2"), F.lit(-1).alias("cl")
        ),
        lambda acc, di: F.when(di["d2"] < acc["d2"], di).otherwise(acc),
    )
    # best staged as ONE aliased column before the field fan-out so
    # CollapseProject cannot duplicate the fold per reference
    return corpus.select(
        F.col(id_col), v.alias("_v"), best.alias("_b")
    ).select(
        F.col(id_col),
        "_v",
        F.col("_b.cl").alias("cluster"),
        F.col("_b.d2").alias("dist2"),
    )


def recompute_centroids(assigned: DataFrame, centroids: list[list[float]]
                        ) -> list[list[float]]:
    """Per-cluster per-dimension exact-decimal means via posexplode +
    one (cluster, dim) hash agg. Empty clusters keep their previous
    centroid (the standard Lloyd's fallback)."""
    dim_rows = (
        assigned.select("cluster", F.posexplode("_v").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg((F.sum(F.col("x").cast(DEC)) / F.count(F.lit(1)))
             .cast("double").alias("m"))
        .collect()
    )
    out = [list(c) for c in centroids]
    for r in dim_rows:
        # cluster == -1 means the assign fold never beat its inf seed
        # (NaN components poison every distance). Writing out[-1] would
        # silently corrupt the LAST centroid — refuse instead: feeding
        # NaN vectors to k-means is a caller bug, not a state to absorb.
        if r["cluster"] < 0:
            raise ValueError(
                "k-means: rows with non-finite vectors reached "
                "recompute_centroids (cluster=-1); filter NaN/Inf "
                "embeddings before clustering"
            )
        out[r["cluster"]][r["dim"]] = r["m"]
    return out


def kmeans(corpus: DataFrame, k: int, iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding"):
    """Run ``iters`` Lloyd's iterations; returns (assigned DataFrame,
    centroids, inertia_per_iteration). Inertia is the exact-decimal sum
    of squared distances — the quantity each iteration provably does
    not increase."""
    centroids = init_centroids(corpus, k, id_col, vec_col)
    inertias: list[float] = []
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(corpus, centroids, id_col, vec_col)
        inertia = assigned.agg(
            F.sum(F.col("dist2").cast(DEC)).cast("double")
        ).collect()[0][0]
        inertias.append(inertia)
        centroids = recompute_centroids(assigned, centroids)
    return assigned, centroids, inertias
