#!/usr/bin/env python
"""Blocking recall of the near-dup production dials on PLANTED true
near-duplicates over the CLUSTERED corpus — the r10 verdict's open
question #2 made measurable.

Why this exists: q273's census measures blocking recall at τ=0.25 on
the near-orthogonal driver testdata (max pairwise cosine ≈ 0.5) — a
LOWER bound regime with no true near-dups in it.  The claim that
justifies deleting dedup losers at 100 TB — "true near-identical pairs
(cosine → 1) co-locate with probability → 1" — was extrapolated, not
measured.  This tool measures it: it takes the clustered clone corpus
(tools/gen_scale_data.py — 10-centroid, the realistic shape), PLANTS
perturbed copies at known ids (pairs with exact cosine in ~0.95–0.999,
the production dedup band), and reports the fraction of planted pairs
each dial blocks together, per cosine band, for nassign ∈ {1, 2, 4} —
alongside the candidate-pair cost each nassign buys, so the
recall/cost tradeoff is a table instead of a docstring.

Planting (closed-form, deterministic — the generator's xxhash64
discipline, no RNG state):

* source ids: every vec_id with u("plant", id) < RATE (~5%)
* planted vector: L2-normalize(v_src + eps * w), w elementwise
  uniform(-0.5, 0.5) from xxhash64(id, dim), eps = eps_lo + u * (eps_hi
  - eps_lo) with [0.02, 0.145] spanning cosine ≈ [0.999, 0.947] for
  64-dim noise (cos θ = 1/sqrt(1 + eps²|w_perp|²) with |w|² ≈ 64/12)
* planted id: src_id + 10^9 (disjoint from any clone's id range)
* ground truth: the (src, src + 10^9) pairs and their EXACT cosine —
  known by construction, no all-pairs scan at any scale

nassign cost law (flat dial): assigning each vector to its top-k cells
multiplies candidate pairs by ~k² at FIXED ncells; re-balancing ncells
to k·√n restores ~√n occupancy so both assignment and pair work scale
LINEARLY in k — the tool sizes ncells = nassign·isqrt(n) for exactly
that reason, and reports measured candidate-pair counts so the law is
checked, not assumed.  The hierarchical dial takes top-nassign at BOTH
levels (nassign² leaf memberships) with the fan-out left at n^(1/3).

Usage:
    python tools/neardup_recall.py [--sf-dir .scaledata/sf1] \
        [--out NEARDUP_RECALL.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from geospatial_etl_pipeline_spark.operators.similarity import (  # noqa: E402
    auto_fanout,
    hierarchical_cell_assignments,
    ivf_cell_assignments,
)
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402

PLANT_RATE = 0.05
PLANT_OFFSET = 10**9
EPS_LO, EPS_HI = 0.02, 0.145
_U_MOD = 2**31
BANDS = [(0.95, 0.97), (0.97, 0.99), (0.99, 1.0000001)]


def _u(tag: str, *cols) -> F.Column:
    h = F.xxhash64(F.lit(tag), *cols)
    return (F.pmod(h, F.lit(_U_MOD))).cast("double") / F.lit(float(_U_MOD))


def plant_near_dups(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(corpus_with_planted, planted_pairs) — planted_pairs carries
    (id_a=src, id_b=src+OFFSET, cosine) with the EXACT double cosine of
    each planted pair, computed in-row at plant time (no pair scan)."""
    v = F.col("embedding")
    src = emb.filter(_u("plant", F.col("vec_id")) < PLANT_RATE)
    eps = (F.lit(EPS_LO)
           + _u("plant_eps", F.col("vec_id")) * F.lit(EPS_HI - EPS_LO))
    dims = F.sequence(F.lit(0), F.size(v) - 1)
    noise = F.transform(
        dims, lambda j: _u("plant_w", F.col("vec_id"), j) - F.lit(0.5)
    )
    raw = F.zip_with(
        v, noise, lambda x, w: x.cast("double") + F.col("_eps") * w
    )
    planted = (
        src.withColumn("_eps", eps)
        .withColumn("_raw", raw)
        .withColumn(
            "_n",
            F.sqrt(F.aggregate(
                F.col("_raw"), F.lit(0.0), lambda a, x: a + x * x
            )),
        )
        .withColumn(
            "_dot",
            F.aggregate(
                F.zip_with(
                    v, F.col("_raw"),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        .withColumn(
            "_vn",
            F.sqrt(F.aggregate(
                v, F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            )),
        )
    )
    rows = planted.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.transform(
            F.col("_raw"), lambda x: (x / F.col("_n")).cast("float")
        ).alias("embedding"),
        F.col("label"),
    )
    pairs = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + PLANT_OFFSET).alias("id_b"),
        (F.col("_dot") / (F.col("_vn") * F.col("_n"))).alias("cosine"),
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(rows)
    return corpus, pairs


def _recall_and_cost(
    assigned: DataFrame, keys: list[str], pairs: DataFrame
) -> tuple[dict, int]:
    """Per-band recall of planted pairs (blocked iff ANY shared key
    tuple) + the dial's total candidate-pair count Σ C(occupancy, 2)."""
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        *[F.col(k).alias(f"{k}_a") for k in keys],
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        *[F.col(k).alias(f"{k}_b") for k in keys],
    )
    cond = None
    for k in keys:
        c = F.col(f"{k}_a") == F.col(f"{k}_b")
        cond = c if cond is None else cond & c
    hit = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy("id_a", "id_b", "cosine")
        .agg(F.max(F.when(cond, 1).otherwise(0)).alias("hit"))
    )
    # per-band + overall recall, collected as one tiny aggregate
    aggs = [
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("hit").alias("n_hit"),
    ]
    for i, (lo, hi) in enumerate(BANDS):
        inband = (F.col("cosine") >= lo) & (F.col("cosine") < hi)
        aggs.append(F.sum(F.when(inband, 1).otherwise(0)).alias(f"n_{i}"))
        aggs.append(
            F.sum(F.when(inband, F.col("hit")).otherwise(0)).alias(f"h_{i}")
        )
    r = hit.agg(*aggs).collect()[0]
    out = {
        "n_pairs": r["n_pairs"],
        "recall": (r["n_hit"] / r["n_pairs"]) if r["n_pairs"] else None,
    }
    for i, (lo, hi) in enumerate(BANDS):
        out[f"recall_{lo:g}_{hi if hi <= 1 else 1:g}"] = (
            (r[f"h_{i}"] / r[f"n_{i}"]) if r[f"n_{i}"] else None
        )
        out[f"n_{lo:g}_{hi if hi <= 1 else 1:g}"] = r[f"n_{i}"]
    occ = assigned.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    cand = occ.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("bigint").alias("cand")
    ).collect()[0]["cand"]
    return out, int(cand or 0)


def main() -> None:
    sf_dir = "/root/repo/.scaledata/sf1"
    out_json = "NEARDUP_RECALL.json"
    only: set | None = None
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    if "--out" in sys.argv:
        out_json = sys.argv[sys.argv.index("--out") + 1]
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    spark = get_spark("neardup-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus, pairs = plant_near_dups(emb)
    corpus = corpus.cache()
    n = corpus.count()
    pairs = pairs.cache()
    n_pairs = pairs.count()
    print(f"# corpus {n} rows incl. planted; {n_pairs} planted pairs",
          file=sys.stderr, flush=True)

    out: dict = {
        "sf_dir": sf_dir,
        "corpus_rows": n,
        "planted_pairs": n_pairs,
        "plant_rate": PLANT_RATE,
        "eps_range": [EPS_LO, EPS_HI],
        "dials": {},
    }
    isq = math.isqrt(n)
    f0 = auto_fanout(n)

    def _run(name: str, meta: dict, build) -> None:
        if only is not None and name not in only:
            return
        t0 = time.time()
        assigned, keys = build()
        rec, cand = _recall_and_cost(assigned, keys, pairs)
        out["dials"][name] = {
            **meta,
            **rec,
            "candidate_pairs": cand,
            "wall_sec": round(time.time() - t0, 1),
        }
        print(f"# {name}: {json.dumps(out['dials'][name])}",
              file=sys.stderr, flush=True)

    for nassign in (1, 2, 3, 4):
        nc = max(16, nassign * isq)
        _run(
            f"flat_nassign{nassign}", {"ncells": nc},
            lambda nassign=nassign, nc=nc: (
                ivf_cell_assignments(
                    corpus, ncells=nc, nassign=nassign, corpus_rows=n,
                ).select("vec_id", "cent_id"),
                ["cent_id"],
            ),
        )
    for nassign in (1, 2, 4):
        _run(
            f"hier_nassign{nassign}", {"fanout": f0},
            lambda nassign=nassign: (
                hierarchical_cell_assignments(
                    corpus, fanout=f0, nassign=nassign, corpus_rows=n,
                ).select("vec_id", "cell1", "cell2"),
                ["cell1", "cell2"],
            ),
        )
    # r12 candidates for the deletion-grade sub-n^1.5 dial: (a) the
    # cross-product nassign=2 with the fan-out re-balanced (leaves
    # scaled by a² or a³ to absorb the a² memberships), (b) the beamed
    # global-leaf top-k mode (memberships n·k by construction, fan-out
    # re-balanced by auto_fanout's isqrt(k·f₀²) law)
    rebal = [
        ("hier_a2_f2x", dict(fanout=2 * f0, nassign=2), None),
        # the escalation dial for corpora where a=2's recall decays
        # below deletion grade: same a²-linear law, 9/4 the candidates
        ("hier_a3_f3x", dict(fanout=3 * f0, nassign=3), None),
        ("hier_a2_f2.8x",
         dict(fanout=max(4, math.isqrt(8 * f0 * f0)), nassign=2), None),
        ("hier_topk2_f1x", dict(fanout=f0, nassign=2), 2),
        ("hier_topk2",
         dict(fanout=auto_fanout(n, leaf_topk=2), nassign=2), 2),
        ("hier_topk3",
         dict(fanout=auto_fanout(n, leaf_topk=3), nassign=3), 3),
    ]
    for name, kw, k in rebal:
        _run(
            name, {**kw, "leaf_topk": k},
            lambda kw=kw, k=k: (
                hierarchical_cell_assignments(
                    corpus, corpus_rows=n, leaf_topk=k, **kw,
                ).select("vec_id", "cell1", "cell2"),
                ["cell1", "cell2"],
            ),
        )

    with open(out_json, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "dials"}))


if __name__ == "__main__":
    main()
