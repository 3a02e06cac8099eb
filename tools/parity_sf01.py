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

from geospatial_etl_pipeline_spark.oracle import (  # noqa: E402
    compare,
    duckdb_connection,
)
from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.plans.dedup import (  # noqa: E402
    _SQL_LSH_CTES,
)
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


# ---- shared-CTE materialization (r12) --------------------------------
# The sf1 slow lane (q125/q142/q216/q269/q270) exists because DuckDB
# pays ~422 s for the minhash/LSH inventory behind the shared
# `lsh_pairs` CTE — and each slow-lane oracle re-paid it, ~35 min of
# sweep wall for seconds of downstream work.  The sweep now runs the
# EXACT shared chain text ONCE per (sweep, corpus) — `WITH
# {_SQL_LSH_CTES} SELECT id_a, id_b, jaccard FROM lsh_pairs` — into a
# parquet file, then rewrites each composing oracle's `lsh_pairs` body
# to read it back.  Semantics are unchanged by construction: the
# materialized rows ARE the same SQL text's output on the same views,
# and the rewrite refuses any oracle that doesn't embed the exact
# chain constant (so a chain edit can never silently pair a stale
# materialization with a newer oracle).


def _materialize_lsh_pairs(tmpdir: str) -> str:
    path = os.path.join(tmpdir, "lsh_pairs_mat.parquet")
    t0 = time.perf_counter()
    con = duckdb_connection(SF_DIR)
    try:
        con.execute(
            f"COPY (WITH {_SQL_LSH_CTES} SELECT id_a, id_b, jaccard "
            f"FROM lsh_pairs) TO '{path}' (FORMAT PARQUET)"
        )
    finally:
        con.close()
    print(f"# lsh_pairs materialized once: {path} "
          f"({round(time.perf_counter() - t0, 1)}s)",
          file=sys.stderr, flush=True)
    return path


def _rewrite_lsh_oracle(oracle: str, path: str) -> str:
    if _SQL_LSH_CTES not in oracle:
        raise ValueError(
            "oracle does not embed the exact _SQL_LSH_CTES chain — "
            "refusing to pair it with the materialized lsh_pairs"
        )
    head = _SQL_LSH_CTES[: _SQL_LSH_CTES.index("lsh_pairs AS (")]
    mat = (head
           + "lsh_pairs AS (\n"
           + f"  SELECT id_a, id_b, jaccard FROM read_parquet('{path}')\n"
           + ")")
    return oracle.replace(_SQL_LSH_CTES, mat, 1)


def main() -> None:
    global SF_DIR
    out_json = sys.argv[1] if len(sys.argv) > 1 else "PARITY_SF01.json"
    if len(sys.argv) > 2:
        SF_DIR = sys.argv[2]
    catalog.load_all_plans()
    spark = get_spark("parity-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    lsh_targets = [
        n for n in TARGETS
        if _SQL_LSH_CTES in (catalog.QUERIES[n].oracle or "")
    ]
    tmpdir_ctx = tempfile.TemporaryDirectory()
    lsh_path = (
        _materialize_lsh_pairs(tmpdir_ctx.name) if len(lsh_targets) >= 2
        else None
    )
    results: dict[str, dict] = {}
    for name in TARGETS:
        spec = catalog.QUERIES[name]
        oracle = spec.oracle
        if lsh_path is not None and name in lsh_targets:
            oracle = _rewrite_lsh_oracle(oracle, lsh_path)
        t0 = time.perf_counter()
        try:
            res = compare(name, spark, SF_DIR, spec.fn, oracle)
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
