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

Usage: python tools/parity_sf01.py [out_json] [sf_dir]

r9: sf_dir is overridable so the same sweep runs against the
seed-deterministic scale clones (tools/gen_scale_data.py) — the sf1
run is the engine's first correctness evidence at 10x the driver's
largest scale (PARITY_SCALE_r09.json).
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

# Oracles that are INTENTIONALLY quadratic/recursive specs (pairwise
# joins, transitive closure, per-pair list intersections): tractable at
# the sf0.01 gate, prohibitive for DuckDB at sf0.1. Their ENGINE side
# is exercised at sf0.1 by bench.py.
HEAVY_ORACLES = {
    "q42_lsh_near_dup_pairs",
    "q48_ngram_jaccard_pairs",
    "q49_dedup_clusters",
    "q150_dedup_savings_report",  # rides the same recursive-CTE closure
    "q238_dup_cluster_source_purity",  # same recursive-CTE closure
    "q239_core_peel_census",  # unrolled peel rounds over the LSH CTEs
    "q258_cluster_aware_split",  # r7: sliced q49 recursive closure
    "q264_cluster_quality_keeper",  # r7: same sliced closure + scoring
    "q55_embedding_near_dup",
    "q84_lsh_ann_oracle",
    "q111_dup_graph_degrees",
    # per-(doc x doc/benchmark) or unnest-heavy list oracles that grow
    # superlinearly in DuckDB but are fine in the engine:
    "q53_knn_topk_multi_query",
    "q247_rrf_fusion",  # embeds q56's full oracle + a q53-shaped brute arm
    "q50_cosine_topk",
    "q51_label_centroids",
    "q52_norm_stats_per_label",
}

# Additional exclusions for a specific run (r9): oracles that are
# tractable at sf0.1 but pathological at the sf1 clone — set
# PARITY_EXTRA_EXCLUDE=q121_semantic_dedup,... before invoking.
# The excluded queries' ENGINE side is still timed at sf1 by
# tools/scale_curve.py; their oracle check stands at sf0.01/sf0.1.
EXTRA_EXCLUDE = {
    n for n in os.environ.get("PARITY_EXTRA_EXCLUDE", "").split(",") if n
}

catalog.load_all_plans()
TARGETS = sorted(
    name for name, spec in catalog.QUERIES.items()
    if spec.oracle is not None
    and name not in HEAVY_ORACLES
    and name not in EXTRA_EXCLUDE
)


def main() -> None:
    global SF_DIR
    out_json = sys.argv[1] if len(sys.argv) > 1 else "PARITY_SF01.json"
    if len(sys.argv) > 2:
        SF_DIR = sys.argv[2]
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
