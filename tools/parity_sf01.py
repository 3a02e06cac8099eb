#!/usr/bin/env python
"""Targeted oracle parity at sf0.1 — scale-drift check.

sf0.01 is the driver's correctness gate; this runs a 10x-larger check
over the queries whose semantics could drift with scale (integer
overflow headroom, window frames over longer event histories, spine
explosion in gap-fill, per-cell caps saturating) while skipping the
queries whose ORACLE is intentionally a quadratic spec (q48/q42/q49
pairwise joins, recursive CTE closure) — those are validated at sf0.01
where the spec is tractable; their ENGINE side is benchmarked at sf0.1
by bench.py.

Usage: python tools/parity_sf01.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geospatial_etl_pipeline_spark.oracle import compare  # noqa: E402
from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

TARGETS = [
    # events family: longer histories, RANGE frames, session chains
    "q46_range_join_clicks_before_purchase",
    "q47_user_event_gaps",
    "q60_tumbling_window_counts",
    "q61_asof_last_click",
    "q62_sessionize",
    "q65_sliding_window_counts",
    "q86_funnel_steps",
    "q87_cohort_retention",
    "q88_scd2_user_history",
    "q89_range_frame_rolling",
    "q94_session_stats",
    "q100_hourly_gap_fill",
    "q102_user_event_milestones",
    # round-3 text/sampling additions: overflow + cap saturation
    "q76_token_length_histogram",
    "q77_incremental_dedup",
    "q78_canonical_doc_selection",
    "q79_benchmark_decontamination",
    "q93_tfidf_salient_terms",
    "q98_per_source_caps",
    "q99_corpus_build",
    "q104_weighted_downsample",
    "q105_oov_rate",
    # multiset set ops on 10x rows
    "q101_set_ops_all_multiset",
    # quality / profiling family on 10x rows
    "q106_iqr_outliers",
    "q107_repetition_signals",
    "q108_c4_cleaning_flags",
    "q109_table_profile",
    "q110_referential_integrity",
]


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "PARITY_SF01.json"
    catalog.load_all_plans()
    spark = get_spark("parity-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in TARGETS:
        spec = catalog.QUERIES[name]
        t0 = time.perf_counter()
        try:
            res = compare(name, spark, SF_DIR, spec.fn, spec.oracle)
            results[name] = {
                "status": "ok" if res.ok else "FAIL",
                "spark_rows": res.spark_rows,
                "issues": res.issues[:3],
            }
        except Exception as exc:  # noqa: BLE001
            results[name] = {
                "status": "ERROR",
                "issues": [f"{type(exc).__name__}: {exc}"[:300]],
            }
        results[name]["sec"] = round(time.perf_counter() - t0, 2)
        print(f"{results[name]['status']:7s} {name} ({results[name]['sec']}s)",
              file=sys.stderr, flush=True)
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    summary = {"sf_dir": SF_DIR, "total": len(results), "ok": n_ok,
               "results": results}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"total": len(results), "ok": n_ok}))


if __name__ == "__main__":
    main()
