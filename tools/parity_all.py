#!/usr/bin/env python
"""Run the FULL query catalog against the DuckDB oracle at a given scale
factor and write a machine-readable artifact (PARITY_ALL.json) plus a
markdown table to stdout.

This is the self-check the driver's 50-query sample can't give us: every
registered query, including the ones sample rotation never picks, gets a
recorded green/red row that rounds can diff.

Usage: python tools/parity_all.py [sf_dir] [out_json]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "PARITY_ALL.json"
    catalog.load_all_plans()
    spark = get_spark("parity-all")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name in sorted(catalog.QUERIES):
        spec = catalog.QUERIES[name]
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                results[name] = {"status": "rows_only", "spark_rows": n}
            else:
                res = compare(name, spark, sf_dir, spec.fn, spec.oracle)
                results[name] = {
                    "status": "ok" if res.ok else "FAIL",
                    "spark_rows": res.spark_rows,
                    "oracle_rows": res.oracle_rows,
                    "issues": res.issues[:3],
                }
        except Exception as exc:  # noqa: BLE001 — record and continue
            results[name] = {
                "status": "ERROR",
                "issues": [f"{type(exc).__name__}: {exc}"[:300]],
            }
        results[name]["sec"] = round(time.perf_counter() - t0, 2)
        print(f"{results[name]['status']:9s} {name} ({results[name]['sec']}s)",
              file=sys.stderr, flush=True)

    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    n_rows = sum(1 for r in results.values() if r["status"] == "rows_only")
    n_bad = len(results) - n_ok - n_rows
    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "oracle_ok": n_ok,
        "rows_only": n_rows,
        "failed": n_bad,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("sf_dir", "total", "oracle_ok", "rows_only", "failed")}))


if __name__ == "__main__":
    main()
