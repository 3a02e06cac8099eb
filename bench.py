#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_pricing_summary": sec, ...},
     "sentinel_median_sec": s, "normalized_total": R,
     "heavy_total_sec": H, "heavy_normalized_total": HR,
     "detail_file": "bench_detail.json", "sf": 0.1}

The FULL record (per-query normalized maps, sentinel run series, the
heavy + extra families) is written to ``bench_detail.json`` next to this
script, NOT printed: the driver's stdout capture keeps only a ~3 KB tail,
and from r4-r6 the single giant line exceeded it, so the official
BENCH_r{N}.json artifacts recorded a truncated fragment with
``parsed: null`` (r6 verdict item 1).  The compact line is ~1.1 KB and
self-contained (value + normalized_total + sentinel median — everything
the cross-round comparison needs).  ``python bench.py --full`` prints the
full record instead, for local BENCH_LOCAL_r{N}.json appends.

Each query executes end-to-end via the no-op sink (full plan execution,
no collect/driver materialization). A warmup query amortizes JVM/codegen
startup out of the first measurement.

Noise immunity: this box swings 1.5-2x in multi-minute host-level
phases (verified in BENCH_LOCAL_r03.json: unchanged trivial plans
inflate uniformly; CPU microbenchmarks inside a phase are stable).  A
fixed CPU-bound sentinel (pure whole-stage-codegen range-sum, zero IO,
zero shuffle, data-independent) runs BEFORE EVERY headline query; each
query's ``normalized`` value is raw_sec / median(sentinel_sec).  Raw
seconds ride the host phase; the normalized ratio cancels it.  Gate
comparisons across rounds should prefer ``normalized_total``
(sum of raw seconds / median sentinel) once two rounds both record it.

Phase-excusal protocol (r11, closing the r10 verdict's blind spot):
the run-wide sentinel MEDIAN cannot see a HALF-run host phase — in
BENCH_r10 ten contiguous queries breached 2x their r1 numbers while the
sentinels interleaved in exactly that window spiked 3.1-5.9x the
median, yet the median itself sat at an all-time low, so the artifact
could not excuse itself.  The fix keys the excusal on the sentinels
ADJACENT to each query, not the run-wide aggregate:

* ``local_sentinel_median`` per query — median of the +/-2 window of
  interleaved sentinel runs around that query's slot (sentinel i fires
  immediately before query i, sentinel i+1 immediately after, so the
  window straddles the query's actual wall-clock span).
* ``calm_ref`` — the 25th percentile of the run's sentinel series: the
  calm floor of THIS run, so a fully-calm run has phase_factor ~1 and
  corrected == raw.
* ``phase_factor`` per query = local_sentinel_median / calm_ref;
  ``corrected`` = raw / phase_factor, applied ONLY when the window is
  decisively elevated (phase_factor >= 1.5) — a point sentinel can't
  distinguish milder wobble from a real plan change, so pf < 1.5 slots
  stay raw and never excuse anything.
* ``breaches`` — every headline query whose raw exceeds 2x its frozen
  r1 per-query baseline, each flagged ``phase_excused`` true iff its
  window was decisively elevated (the breach is attributable to the
  host phase, with the local window published beside it).
* ``gate_verdict`` — "green" (raw total <= 41.9 s), or
  "green_phase_excused" (raw total over the gate but the corrected
  total — the total with ONLY phase-attributed inflation removed — is
  inside it), or "red".  The gate is on the TOTAL, so the verdict asks
  whether the plans-at-calm-host cost clears it; a genuine regression
  in a calm window is never corrected and keeps the verdict red once
  it alone carries the total past the gate.  The raw total and raw
  per-query series are UNTOUCHED — the r1 comparison stays raw-vs-raw;
  the verdict field only adjudicates whether an overage is host phase
  or regression, with the evidence (local windows, factors) in the
  same artifact.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (scan-agg, join-topk, snowflake,
# multi-join profit, pushdown, window, dedup/LSH/simhash/fingerprint,
# similarity, events/asof, ref-parity metadata, raster clip).
# FROZEN at the r1 list of 25 so "value" stays comparable to BASELINE.md.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q05_nation_revenue",
    "q06_revenue_delta",
    "q09_product_profit",
    "q20_topk_orders_per_priority",
    "q21_running_customer_spend",
    "q38_rolling_hash_fingerprint",
    "q40_dedup_exact",
    "q42_lsh_near_dup_pairs",
    "q44_simhash",
    "q46_range_join_clicks_before_purchase",
    "q48_ngram_jaccard_pairs",
    "q50_cosine_topk",
    "q54_ann_lsh_topk",
    "q55_embedding_near_dup",
    "q56_ivf_topk",
    "q60_tumbling_window_counts",
    "q61_asof_last_click",
    "q62_sessionize",
    "q64_pandas_udaf_wavg",
    "q72_metadata_documents",
    "q90_raster_clip_stats",
    "q95_media_content_stats",
    "q96_media_feature_moments",
]

# The most expensive plans in the catalog, promoted to a FIRST-CLASS
# series (r4 verdict item 6): timed every round with their own
# normalized totals so round-over-round perf of the heavy family is a
# headline signal — still EXCLUDED from "value" so the frozen 25-query
# total stays an apples-to-apples series against BASELINE.md (q48, the
# fourth member of the family, is already inside the frozen 25).
# r4 reference (extra_normalized, BENCH_r04.json): q49 24.0,
# q121 28.2, q125 18.6.
HEAVY = [
    "q49_dedup_clusters",
    "q121_semantic_dedup",
    "q125_pagerank_dup_graph",
]

# Additional plans worth timing — reported, not summed into any gate.
EXTRA = [
    # r10: the registered near-dup production dials (round-over-round
    # series beside the frozen-headline q55 legacy dial)
    "q271_ivf_cell_near_dup",
    "q272_hierarchical_near_dup",
    # r12: the re-balanced deletion-grade sub-n^1.5 dial + its census
    "q277_hier2_deletion_near_dup",
    "q278_hier2_blocking_census",
    "q100_hourly_gap_fill",
    "q111_dup_graph_degrees",
    "q127_ngram_containment_pairs",
    "q155_vocab_growth",
    "q156_zipf_curve",
    "q162_lsh_band_skew",
    "q163_minhash_calibration",
    "q167_source_boilerplate",
    "q201_rolling_weekly_actives_sketch",
    "q202_embedding_validation_audit",
    # round-6 additions (one per new family)
    "q203_idw_interpolation",
    "q206_corpus_containment",
    "q207_chunk_dedup_census",
    "q208_skyline_pareto",
    "q209_interval_concurrency",
    "q213_linear_interpolation",
    "q214_table_checksum",
    "q215_incremental_view_merge",
    "q216_two_hop_reach",
    # continuation additions (one per new family)
    "q217_bigram_lm_score",
    "q218_source_divergence",
    "q219_dsir_importance",
    "q220_d8_flow_census",
    "q221_d8_inflow_census",
    "q222_lexical_richness",
    "q223_transition_gini",
    "q224_knn_label_consistency",
    # second-continuation additions (one per new family)
    "q226_waiting_suppliers",     # decorrelated double-EXISTS shape
    "q229_kaplan_meier_table",    # survival windows
    "q231_weighted_systematic_sample",  # decomposed global cumsum
    "q232_d8_flow_accumulation",  # pointer-doubling closure (iterative)
    "q234_mann_whitney_u",        # histogram-ranked statistic
    "q237_hard_negative_mining",  # broadcast anchors x corpus scan
    "q243_order_backlog_series",  # two-cumulative-series merge
    "q247_rrf_fusion",            # hybrid retrieval fusion (two arms)
    "q250_corpus_release_manifest",  # the ship-it composite
    # round-7 additions
    "q255_knn_consistency_ivf",   # IVF-backed q224 arm (cell-join candidates)
    "q263_semantic_decontamination",  # broadcast-eval embedding leak census
    "q265_rare_trigram_link_pairs",   # df-capped inverted-index linking
    # round-8 additions (the integer-rank + graph-structure families)
    "q266_source_quality_drift",  # leave-one-out KS over CDF grids
    "q267_trimmed_price_stats",   # rank-exact trim/winsorize
    "q268_token_count_gini",      # histogram-ranked exact Gini
    "q269_dup_graph_triangles",   # degree-oriented triangle census
    "q270_dup_graph_assortativity",  # BIGINT-sufficient-stat Pearson
]

# Frozen r1 per-query raw seconds (BENCH_r01.json "queries") — the
# per-query denominators of the 2x gate.  BASELINE.md: r1 total
# 20.963 s -> raw gate 41.9 s.  These never change; they are the other
# side of the raw-vs-raw comparison every later round is held to.
R1_BASELINE = {
    "q01_pricing_summary": 1.203,
    "q02_top_revenue_orders": 0.94,
    "q05_nation_revenue": 0.815,
    "q06_revenue_delta": 0.177,
    "q09_product_profit": 0.574,
    "q20_topk_orders_per_priority": 0.239,
    "q21_running_customer_spend": 0.343,
    "q38_rolling_hash_fingerprint": 2.339,
    "q40_dedup_exact": 0.164,
    "q42_lsh_near_dup_pairs": 2.233,
    "q44_simhash": 3.072,
    "q46_range_join_clicks_before_purchase": 0.265,
    "q48_ngram_jaccard_pairs": 1.928,
    "q50_cosine_topk": 0.281,
    "q54_ann_lsh_topk": 2.033,
    "q55_embedding_near_dup": 0.51,
    "q56_ivf_topk": 0.923,
    "q60_tumbling_window_counts": 0.213,
    "q61_asof_last_click": 0.307,
    "q62_sessionize": 0.22,
    "q64_pandas_udaf_wavg": 0.238,
    "q72_metadata_documents": 1.316,
    "q90_raster_clip_stats": 0.229,
    "q95_media_content_stats": 0.103,
    "q96_media_feature_moments": 0.298,
}
GATE_RAW_TOTAL_SEC = 41.9       # BASELINE.md: 2x the r1 total
PHASE_ELEVATED_FACTOR = 1.5     # local sentinel >= 1.5x calm floor = phase

_SENTINEL_N = 200_000_000


def _local_sentinel_median(sentinels: list, i: int) -> float | None:
    """Median of the +/-2 window of sentinel runs around query slot i.

    Sentinel i fires immediately before query i and sentinel i+1
    immediately after, so indices [i-2, i+2] straddle the query's
    wall-clock span.  ``None`` entries (a failed sentinel run, kept to
    preserve alignment) are skipped."""
    window = [s for s in sentinels[max(0, i - 2): i + 3] if s is not None]
    return round(statistics.median(window), 3) if window else None


def _phase_excusal(
    times: dict[str, float],
    order: list[str],
    sentinels: list,
) -> dict:
    """Adjacent-sentinel phase adjudication (module docstring, r11).

    Returns the excusal block: calm_ref, per-query local medians /
    phase factors / corrected seconds, the per-breach excusal flags,
    and the run-level gate_verdict.  Pure arithmetic on the already-
    recorded raw series — raw numbers are never modified."""
    valid = sorted(s for s in sentinels if s is not None)
    if not valid:
        return {}
    # 25th percentile = the calm floor of this run (lower-interpolation
    # via index so short series behave).
    calm_ref = valid[max(0, (len(valid) - 1) // 4)]
    locals_: dict[str, float] = {}
    factors: dict[str, float] = {}
    corrected: dict[str, float] = {}
    for i, name in enumerate(order):
        if name not in times:
            continue
        loc = _local_sentinel_median(sentinels, i)
        if loc is None:
            continue
        locals_[name] = loc
        f = loc / calm_ref
        factors[name] = round(f, 2)
        # Correct ONLY decisively-elevated windows: a point sentinel
        # can't distinguish pf<1.5 wobble from a real plan change, so
        # mild elevation is left raw and never excuses anything.
        #
        # CAP (ADVICE r11): dividing by the phase factor assumes the
        # slowdown is exactly proportional to the sentinel elevation —
        # which would let a genuine plan regression that lands in a
        # noisy window be excused in full.  The correction is therefore
        # floored at the query's own r1 baseline (or the raw time if
        # the query was already under baseline): the most an excusal
        # can ever claim is "at a calm host this query would have run
        # at its r1 cost", never "faster than it has ever run".
        if f >= PHASE_ELEVATED_FACTOR:
            c = times[name] / f
            base = R1_BASELINE.get(name)
            if base is not None:
                c = max(c, min(times[name], base))
            corrected[name] = round(c, 3)
        else:
            corrected[name] = times[name]
    breaches = []
    for name, raw in times.items():
        base = R1_BASELINE.get(name)
        if base is None or raw <= 2 * base:
            continue
        f = factors.get(name, 1.0)
        breaches.append({
            "query": name,
            "raw_sec": raw,
            "r1_sec": base,
            "ratio_vs_r1": round(raw / base, 2),
            "phase_factor": f,
            "corrected_sec": corrected.get(name, raw),
            # the breach happened inside a decisively-elevated window:
            # attributable to the host phase, not the plan
            "phase_excused": f >= PHASE_ELEVATED_FACTOR,
        })
    raw_total = round(
        sum(t for n, t in times.items() if n in R1_BASELINE), 3
    )
    # corrected_total removes exactly the phase-attributed inflation
    # (only pf>=1.5 slots were corrected); the gate is on the TOTAL, so
    # the verdict asks whether the plans-at-calm-host cost clears it.
    corrected_total = round(
        sum(corrected.get(n, t) for n, t in times.items()
            if n in R1_BASELINE), 3
    )
    if raw_total <= GATE_RAW_TOTAL_SEC:
        verdict = "green"
    elif corrected_total <= GATE_RAW_TOTAL_SEC:
        verdict = "green_phase_excused"
    else:
        verdict = "red"
    out = {
        "calm_ref_sec": calm_ref,
        "local_sentinel_median": locals_,
        "phase_factor": factors,
        "corrected": corrected,
        "corrected_total_sec": corrected_total,
        "breaches": breaches,
        "gate_raw_total_sec": GATE_RAW_TOTAL_SEC,
        "gate_verdict": verdict,
    }
    if verdict == "green_phase_excused":
        # An excusal is evidence-backed but still an extrapolation —
        # the honest next step is a calm-window rerun, and the
        # artifact says so explicitly (ADVICE r11).
        out["rerun_recommended"] = True
    return out


def run_sentinel(spark) -> float:
    """Fixed CPU-bound probe: one whole-stage-codegen range fold, no IO,
    no shuffle, no Python workers — pure JVM arithmetic across all
    cores.  Its only variable is host CPU availability, which is
    exactly the noise term we want to divide out."""
    t0 = time.perf_counter()
    spark.range(_SENTINEL_N).selectExpr(
        "sum(id % 7) AS s"
    ).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def run_query(spark, fn, sf_dir: str, reps: int = 3) -> float:
    """Min of ``reps`` end-to-end executions (fresh plan each time).

    Single-shot numbers on this box are bimodal: identical plans swing
    10-20x across runs in multi-minute phases (verified not to be our
    plans: single-core and 32-way CPU microbenchmarks are stable ±5%,
    zero steal, no swap — the noise arrives from outside the guest).
    Measured per-query: the first rep is routinely 2-3x the steady
    state even after global warmup (fresh codegen + shuffle-file cache
    per plan), and the second rep still occasionally catches a noise
    phase — min of three is the steady-state cost of the PLAN, which
    is what this benchmark is for."""
    return min(run_once(spark, fn, sf_dir) for _ in range(reps))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    catalog.load_all_plans()
    spark = get_spark("geospatial-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: spin the JVM, parquet footer caches, codegen — and the
    # Python worker pool (first Arrow UDF of a session pays worker
    # startup; that's session setup, not query cost).
    try:
        run_sentinel(spark)
        run_once(spark, catalog.QUERIES["q01_pricing_summary"].fn, sf_dir)
        ncpu = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
        spark.range(1000, numPartitions=ncpu).mapInPandas(
            lambda it: it, "id long"
        ).write.mode("overwrite").format("noop").save()
        # ... and the DataFrame->RDD bridge: the first .rdd access of a
        # session pays ~0.95 s of py4j/serializer setup (later calls
        # ~0.07 s).  fan_out() (sources/tables.py) and localCheckpoint
        # staging ride that bridge inside query fns, so warm it here —
        # session setup, not query cost, same rationale as the Arrow
        # worker-pool warmup above (r12).
        spark.range(8).rdd.getNumPartitions()
    except Exception as exc:  # noqa: BLE001 — warmup is best-effort
        print(f"# warmup failed: {exc}", file=sys.stderr, flush=True)

    # Per-query fixed-overhead floor (r13, VERDICT r12 item 7 —
    # additions-only): the cheapest possible query-shaped action (a
    # 1-row plan through the same noop sink, fresh plan each rep, like
    # run_query) measures the session's per-execution constant —
    # analysis + job scheduling + stage launch + sink commit.  At sf0.1
    # this floor is a large fraction of every sub-second query, so the
    # normalized series needs it to separate "plan cost" from "session
    # floor".  Reported beside the sentinel; never enters any gate.
    floor = None
    try:
        floor = round(
            min(
                run_once(
                    spark, lambda s, _d: s.range(1).selectExpr("id"), sf_dir
                )
                for _ in range(5)
            ),
            3,
        )
    except Exception as exc:  # noqa: BLE001 — instrumentation only
        print(f"# floor probe failed: {exc}", file=sys.stderr, flush=True)

    # Per-query failure isolation: one broken query must never abort the
    # run (round-2 lesson — a single AnalysisException cost the entire
    # perf record). Failures are reported in "errors"; when any headline
    # query fails, "value" is null and "incomplete" is true so a partial
    # total can never spuriously beat the gate.
    times: dict[str, float] = {}
    heavy_times: dict[str, float] = {}
    extra_times: dict[str, float] = {}
    sentinels: list[float] = []
    errors: dict[str, str] = {}
    for name in HEADLINE + HEAVY + EXTRA:
        bucket = (
            times if name in HEADLINE
            else heavy_times if name in HEAVY
            else extra_times
        )
        try:
            sentinels.append(round(run_sentinel(spark), 3))
        except Exception as exc:  # noqa: BLE001
            # keep slot alignment: sentinel i must stay adjacent to
            # query i for the local-window excusal to index correctly
            sentinels.append(None)
            print(f"# sentinel failed: {exc}", file=sys.stderr, flush=True)
        try:
            spec = catalog.QUERIES[name]
            bucket[name] = round(run_query(spark, spec.fn, sf_dir), 3)
            print(f"# {name}: {bucket[name]}s", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr, flush=True)

    headline_errors = [n for n in errors if n in HEADLINE]
    total = round(sum(times.values()), 3)
    valid_sentinels = [s for s in sentinels if s is not None]
    med_sent = (
        round(statistics.median(valid_sentinels), 3)
        if valid_sentinels else None
    )
    out: dict = {
        "metric": "total_query_sec",
        # A partial sum must never masquerade as a full run: null value +
        # incomplete flag when any headline query errored.
        "value": None if headline_errors else total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "sentinel": {
            "plan": f"range({_SENTINEL_N}).sum(id % 7), noop sink",
            "runs": sentinels,
            "median_sec": med_sent,
        },
    }
    if floor is not None:
        # measured per-execution session floor (see probe above): raw
        # seconds and the sentinel-normalized form the cross-round
        # series should read
        out["overhead_floor_sec"] = floor
        if med_sent:
            out["overhead_floor_normalized"] = round(floor / med_sent, 2)
    if med_sent:
        out["normalized"] = {
            n: round(t / med_sent, 2) for n, t in times.items()
        }
        out["normalized_total"] = round(total / med_sent, 2)
    if heavy_times:
        # first-class heavy-family series (own totals, never in "value")
        out["heavy_queries"] = heavy_times
        out["heavy_total_sec"] = round(sum(heavy_times.values()), 3)
        if med_sent:
            out["heavy_normalized"] = {
                n: round(t / med_sent, 2) for n, t in heavy_times.items()
            }
            out["heavy_normalized_total"] = round(
                sum(heavy_times.values()) / med_sent, 2
            )
    if extra_times:
        out["extra_queries"] = extra_times
        if med_sent:
            out["extra_normalized"] = {
                n: round(t / med_sent, 2) for n, t in extra_times.items()
            }
    # Adjacent-sentinel phase adjudication (module docstring, r11):
    # per-query local windows, corrected totals, breach excusal flags,
    # and the run-level gate_verdict.  Raw series above is untouched.
    excusal = _phase_excusal(times, HEADLINE + HEAVY + EXTRA, sentinels)
    if excusal:
        out["phase_excusal"] = excusal
    if headline_errors:
        out["incomplete"] = True
        out["partial_total_sec"] = total
    if errors:
        out["errors"] = errors

    # Full record → file (always); stdout gets the compact headline line
    # unless --full is passed.  See module docstring: the driver's stdout
    # tail-capture is ~3 KB, so the printed line must stay small.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh)
            fh.write("\n")
    except OSError as exc:
        print(f"# detail write failed: {exc}", file=sys.stderr, flush=True)

    if "--full" in sys.argv[1:]:
        print(json.dumps(out))
        return

    compact: dict = {
        "metric": "total_query_sec",
        "value": out["value"],
        "unit": "sec",
        "queries": times,
        "sentinel_median_sec": med_sent,
        "sf": sf,
        "detail_file": "bench_detail.json",
    }
    if floor is not None:
        compact["overhead_floor_sec"] = floor
    if med_sent:
        compact["normalized_total"] = out.get("normalized_total")
    if excusal:
        compact["gate_verdict"] = excusal["gate_verdict"]
        compact["corrected_total_sec"] = excusal["corrected_total_sec"]
        compact["breaches"] = [
            {k: b[k] for k in
             ("query", "ratio_vs_r1", "phase_factor", "phase_excused")}
            for b in excusal["breaches"]
        ]
    if heavy_times:
        compact["heavy_total_sec"] = out["heavy_total_sec"]
        if med_sent:
            compact["heavy_normalized_total"] = out["heavy_normalized_total"]
    if headline_errors:
        compact["incomplete"] = True
        compact["partial_total_sec"] = total
    if errors:
        # names only — full messages live in the detail file
        compact["error_queries"] = sorted(errors)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
