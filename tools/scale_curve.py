#!/usr/bin/env python
"""Empirical scaling curve: run the headline + heavy + scale-risk query
families at several scale factors and fit a per-query scaling exponent.

Purpose (r8 verdict, next-round item 1): every plan shape is pinned by
assertion (tests/test_plan_shapes.py) but the engine had never RUN above
sf0.1 (17 MB).  A hidden super-linearity — LSH bucket occupancy growth,
posting-list cap interactions, iterative-closure round growth — is
invisible to exchange-budget tests and only shows up in measured
sec-vs-sf.  This tool measures it.

Method:
  * Data: seed-deterministic clones from tools/gen_scale_data.py at
    sf0.1 / sf0.3 / sf1.0 (SAME generator at every scale, so the curve
    is not confounded by driver-vs-clone distribution differences).
  * Timing: min-of-N end-to-end noop-sink executions per (query, sf),
    exactly like bench.py; a CPU sentinel runs before every query and
    each scale's times are normalized by that scale's sentinel median,
    cancelling multi-minute host phases that would otherwise masquerade
    as scaling effects across a ~30-minute sweep.
  * Fit: OLS slope of log(sec) vs log(sf) over all scales ("exponent"),
    plus the last-segment slope sf0.3→sf1.0 ("exponent_tail") which is
    the sensitive detector: fixed per-query overhead (~0.2 s scheduling
    + codegen) dominates small-sf points and biases the full fit DOWN,
    so a tail slope meaningfully above 1 is a real super-linearity, not
    noise.  Both fits are computed on RAW seconds AND on
    sentinel-normalized seconds, and a query is flagged only when BOTH
    tails exceed 1.30: the first sweep showed the CPU sentinel itself
    swinging 1.65x between scale runs (host phases), which inflates
    normalized cross-scale slopes by up to +0.4 — a real super-linearity
    shows in both series, a host phase in only one.  Threshold 1.30
    allows n log n shuffle factors (log(10x)/log(10) ~ +0.1..0.15) plus
    jitter.
  * Variant probes: known fixed-dial catalog queries are re-measured
    with their production dial (e.g. q55's sign-LSH block bits, fixed
    at the parity-pinned test value in the catalog entry, auto-scaled
    via operators.similarity.auto_block_bits here) so the artifact
    shows the scale path's exponent next to the pinned variant's.

Scale design note: at 100 TB you would run the same sweep with sf as
cluster-scale dataset copies; nothing here is local-mode-specific — the
harness only needs a SparkSession and parquet dirs.

Usage:
    python tools/scale_curve.py [--sfs 0.1,0.3,1] [--root .scaledata]
        [--reps 3] [--out SCALE_CURVE_r10.json] [--families headline,heavy,risk]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — reuse HEADLINE/HEAVY, sentinel, min-of-N runner

from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402

# Queries with the scale-risk shapes the r8 verdict named: inverted-index
# posting lists (df caps), LSH band occupancy, iterative pointer-doubling
# closure, graph wedge joins.  HEADLINE already covers q42/q48/q54/q56.
def _q55_production(spark, sf_dir):
    """q55's production form: identical pipeline but block bits chosen
    by auto_block_bits (2^bits ~ n/16) so candidate pairs stay O(n) —
    the catalog entry pins bits=6 for oracle parity, which is the
    quadratic-at-scale dial its own docstring disclaims."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        embedding_near_dup,
    )
    from geospatial_etl_pipeline_spark.plans._util import temb

    return embedding_near_dup(temb(spark, sf_dir), threshold=0.0, topk=25)


def _q55_ivf_cells(spark, sf_dir):
    """q55 re-blocked on IVF coarse cells — since r10 this is the
    REGISTERED q271 production path (√n cells, quantized scoring);
    kept as a variant row so the r9→r10 series stays comparable.
    NOTE r11: the operator default moved to nassign=2 / ncells=2√n
    (the measured deletion-grade recall dial, NEARDUP_RECALL_r11), so
    this row's absolute seconds step up ~2x vs the r10 series — the
    TAIL exponent is the comparable quantity."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        ivf_cell_near_dup,
    )
    from geospatial_etl_pipeline_spark.plans._util import temb

    return ivf_cell_near_dup(temb(spark, sf_dir), threshold=0.0, topk=25)


def _q55_hier_cells(spark, sf_dir):
    """The two-level hierarchical quantizer (r10): fanout = n^(1/3)
    per level balances two assignment passes and within-leaf pairs at
    O(n^(4/3)·d) — the named sub-n^1.5 path past the flat-IVF law.
    This probe measures where the extra corpus exchange (level-2
    window + sub-centroid join) stops paying for the smaller leaves."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        hierarchical_cell_near_dup,
    )
    from geospatial_etl_pipeline_spark.plans._util import temb

    return hierarchical_cell_near_dup(
        temb(spark, sf_dir), threshold=0.0, topk=25
    )


def _q121_production(spark, sf_dir):
    """q121 SemDeDup with the production cluster dial k = √n (the
    flat-quantizer balanced law — the registered entry pins k=8 for
    oracle lockstep with q118/q114, which makes per-cluster pair work
    n²/8, super-linear by construction). Runs the SAME registered
    kernel via plans.similarity.semdedup_prune, so the exponent is the
    production path's, not a reimplementation's (r9 verdict item 5)."""
    from geospatial_etl_pipeline_spark.operators.similarity import (
        auto_ncells,
    )
    from geospatial_etl_pipeline_spark.plans._util import temb
    from geospatial_etl_pipeline_spark.plans.similarity import semdedup_prune

    n = temb(spark, sf_dir).count()
    return semdedup_prune(spark, sf_dir, auto_ncells(n))


VARIANTS = {
    "q55_production_dial": _q55_production,
    "q55_ivf_cells": _q55_ivf_cells,
    "q55_hier_cells": _q55_hier_cells,
    "q121_production_dial": _q121_production,
}

RISK = [
    "q127_ngram_containment_pairs",
    "q206_corpus_containment",
    "q265_rare_trigram_link_pairs",
    "q162_lsh_band_skew",
    "q216_two_hop_reach",
    "q232_d8_flow_accumulation",
    "q269_dup_graph_triangles",
    "q270_dup_graph_assortativity",
    # r10 extension (r9 verdict item 4): the corpus-exchange-heavy
    # families the first sweep skipped
    "q271_ivf_cell_near_dup",          # the new registered production dial
    "q272_hierarchical_near_dup",      # the registered sub-n^1.5 path
    "q277_hier2_deletion_near_dup",    # r12 deletion-grade re-balanced dial
    "q151_rolling_weekly_actives",     # rolling distinct (exact)
    "q201_rolling_weekly_actives_sketch",  # its HLL swap — scale is the point
    "q217_bigram_lm_score",            # bigram-SMJ LM family
    "q218_source_divergence",
    "q219_dsir_importance",
    "q155_vocab_growth",               # Heaps (documented vocab-sort hot part)
    "q156_zipf_curve",                 # Zipf
    "q195_linear_attribution",         # window-heavy event composites
    "q197_deseasonalized_anomalies",
    "q199_repeat_purchase_cohorts",
    # corpus-sized aggregation / gap-fill / calibration shapes
    "q100_hourly_gap_fill",
    "q213_linear_interpolation",
    "q230_cusum_changepoint",
    "q136_event_value_trend",
    "q163_minhash_calibration",
    "q51_label_centroids",
    "q52_norm_stats_per_label",
    "q77_incremental_dedup",
    "q78_canonical_doc_selection",
    "q94_session_stats",
]


def _slope(xs: list[float], ys: list[float]) -> float:
    """OLS slope of ys on xs (both already in log space)."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den if den else float("nan")


def main() -> None:
    argv = sys.argv[1:]

    def _opt(flag: str, default: str) -> str:
        return argv[argv.index(flag) + 1] if flag in argv else default

    sfs = [float(s) for s in _opt("--sfs", "0.1,0.3,1").split(",")]
    root = _opt("--root", "/root/repo/.scaledata")
    reps = int(_opt("--reps", "3"))
    out_path = _opt("--out", "/root/repo/SCALE_CURVE_r10.json")
    fams = _opt("--families", "headline,heavy,risk").split(",")
    only = _opt("--queries", "")
    names: list[str] = []
    if only:
        # explicit subset (catalog names and/or VARIANTS keys) — e.g.
        # the r11 sf3 near-dup-ladder run, where generating the full
        # sf3 clone for every family would add nothing to the question
        names = only.split(",")
    else:
        if "headline" in fams:
            names += bench.HEADLINE
        if "heavy" in fams:
            names += bench.HEAVY
        if "risk" in fams:
            names += RISK
        names += list(VARIANTS)

    catalog.load_all_plans()
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")

    raw: dict[str, dict[str, float]] = {n: {} for n in names}
    norm: dict[str, dict[str, float]] = {n: {} for n in names}
    sent_med: dict[str, float] = {}
    errors: dict[str, str] = {}

    for sf in sfs:
        sf_dir = os.path.join(root, f"sf{sf:g}")
        if not os.path.isdir(sf_dir):
            print(f"# missing {sf_dir}; run tools/gen_scale_data.py {sf}",
                  file=sys.stderr)
            continue
        key = f"{sf:g}"
        # fresh warmup per scale: footer caches + codegen for new paths
        try:
            bench.run_sentinel(spark)
            bench.run_once(
                spark, catalog.QUERIES["q01_pricing_summary"].fn, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup@{key} failed: {exc}", file=sys.stderr)
        sentinels: list[float] = []
        for name in names:
            try:
                sentinels.append(bench.run_sentinel(spark))
            except Exception:  # noqa: BLE001
                pass
            try:
                fn = VARIANTS.get(name) or catalog.QUERIES[name].fn
                t = bench.run_query(spark, fn, sf_dir, reps=reps)
                raw[name][key] = round(t, 3)
                print(f"# sf{key} {name}: {t:.3f}s", file=sys.stderr,
                      flush=True)
            except Exception as exc:  # noqa: BLE001
                errors[f"{name}@{key}"] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"# sf{key} {name}: FAILED {errors[f'{name}@{key}']}",
                      file=sys.stderr, flush=True)
        med = statistics.median(sentinels) if sentinels else None
        sent_med[key] = round(med, 4) if med else None
        if med:
            for name in names:
                if key in raw[name]:
                    norm[name][key] = round(raw[name][key] / med, 3)

    def _fits(series: dict[str, float]) -> dict | None:
        pts = sorted((float(k), v) for k, v in series.items())
        if len(pts) < 2:
            return None
        xs = [math.log(p[0]) for p in pts]
        ys = [math.log(max(p[1], 1e-6)) for p in pts]
        return {
            "exponent": round(_slope(xs, ys), 3),
            "exponent_tail": round(
                (ys[-1] - ys[-2]) / (xs[-1] - xs[-2]), 3),
        }

    queries: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        entry: dict = {"raw_sec": raw[name], "normalized": norm[name]}
        fr, fn_ = _fits(raw[name]), _fits(norm[name])
        if fr:
            entry["raw_fit"] = fr
        if fn_:
            entry["normalized_fit"] = fn_
        if fr and fn_:
            # flag only when BOTH series agree (see module docstring:
            # sentinel host phases inflate normalized slopes alone)
            entry["super_linear"] = (
                fr["exponent_tail"] > 1.30 and fn_["exponent_tail"] > 1.30
            )
            if entry["super_linear"]:
                flagged.append(name)
        queries[name] = entry

    out = {
        "metric": "scaling_exponents",
        "sfs": [f"{s:g}" for s in sfs],
        "reps": reps,
        "data_root": root,
        "sentinel_median_sec": sent_med,
        "queries": queries,
        "flagged_super_linear": flagged,
        "errors": errors,
        "threshold": "raw AND normalized exponent_tail > 1.30 "
        "(n log n + jitter allowance; both-series rule per docstring)",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({
        "metric": "scaling_exponents",
        "n_queries": len(queries),
        "flagged_super_linear": flagged,
        "out": out_path,
    }))


if __name__ == "__main__":
    main()
