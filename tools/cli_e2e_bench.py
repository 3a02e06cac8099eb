#!/usr/bin/env python
"""CLI end-to-end benchmark: the REF-parity pipeline (recursive .asc
scan → decode → region fan-out → clip → stats → naming → GeoTIFF +
zip + metadata sinks) on a BENCH-SCALE synthetic grid tree — proof the
whole pipeline, not just the catalog queries, runs beyond the tiny
test_cli fixture.

Tree: 48 grids (12 parameter codes × 4 period codes) of 200×200 cells
(1.92M cells total) × 10 clip regions → 480 products, every one of
which gets a real GeoTIFF, a stats sidecar, a zip, and a metadata JSON
document. Records row counts + wall time to CLI_E2E_r04.json.

Noise adjudication (r11, closing the r10 verdict's bookkeeping item):
the raw products/s drifted 32.0 (r6) → 29.96 (r9) → 25.88 (r10) with
no sentinel to attribute it. The run is ONE cli.run call, so the
bench.py interleave can't apply; instead the run is BRACKETED by the
same fixed CPU sentinel (3 before + 3 after), the artifact records a
sentinel-normalized throughput (products/s × sentinel median — the
host-speed-invariant figure), and a `verdict_on_trend` field
self-adjudicates against the recorded series: flat-or-better raw, a
host-phase-excused dip (elevated sentinel), or an unexcused drift.

Usage: python tools/cli_e2e_bench.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geospatial_etl_pipeline_spark import cli  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402
from geospatial_etl_pipeline_spark.sources.asc import write_asc  # noqa: E402

_PARAMS = ["00", "01", "02", "03", "04", "09", "11", "17", "23", "33", "34", "37"]
_PERIODS = ["monthly1", "monthly7", "seasonal2", "annual"]
_W = _H = 200

# bench.py's sentinel (same plan, same size): pure whole-stage-codegen
# range fold — its only variable is host CPU availability
_SENTINEL_N = 200_000_000
# the long-run calm sentinel on this box (bench.py series r4-r11:
# calm medians 0.09-0.11 s) and the recorded raw throughput series —
# the references verdict_on_trend adjudicates against
_CALM_SENTINEL_SEC = 0.099
_RAW_SERIES = {"r6": 32.0, "r9": 29.96, "r10": 25.88}
_PHASE_ELEVATED = 1.5   # same bar as bench.py's excusal rule
_FLAT_TOLERANCE = 0.92  # within 8% of the r9 raw = flat


def run_sentinel(spark) -> float:
    t0 = time.perf_counter()
    spark.range(_SENTINEL_N).selectExpr(
        "sum(id % 7) AS s"
    ).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def build_tree(src: str) -> tuple[int, int]:
    n_cells = 0
    for pi, param in enumerate(_PARAMS):
        sub = os.path.join(src, f"p{param}")  # exercise the RECURSIVE scan
        os.makedirs(sub, exist_ok=True)
        for qi, period in enumerate(_PERIODS):
            cells = [
                float((r * 7 + c * 3 + pi * 11 + qi) % 97)
                if (r + c + pi) % 23 != 0
                else -9999.0  # sprinkle nodata
                for r in range(_H)
                for c in range(_W)
            ]
            write_asc(
                os.path.join(sub, f"vcsn_{param}_x_y_mean_{period}.asc"),
                _W, _H, cells,
            )
            n_cells += _W * _H
    return len(_PARAMS) * len(_PERIODS), n_cells


def build_regions(path: str) -> int:
    # 10 rectangles tiling/overlapping the 200×200 grid + excluded "99"
    rows = ["regc_code,region_name_ascii,wkt"]
    for i in range(10):
        x0, y0 = (i % 5) * 40, (i // 5) * 90
        x1, y1 = x0 + 55, y0 + 110
        code = f"{i + 1:02d}"
        rows.append(
            f'{code},Region-{code} Region,"POLYGON(({x0} {y0}, {x1} {y0},'
            f' {x1} {y1}, {x0} {y1}, {x0} {y0}))"'
        )
    rows.append("99,Area Outside Region,")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return 10


def main() -> None:
    # r9: default became a NON-round-stamped working file — the r4
    # default silently overwrote the historical CLI_E2E_r04.json
    # artifact on every later-round run.
    out_json = sys.argv[1] if len(sys.argv) > 1 else "CLI_E2E.json"
    spark = get_spark("cli-e2e-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="cli_e2e_")
    src = os.path.join(work, "grids")
    out = os.path.join(work, "products")
    zips = os.path.join(work, "zips")
    regions_csv = os.path.join(work, "regions.csv")
    try:
        os.makedirs(src)
        n_grids, n_cells = build_tree(src)
        n_regions = build_regions(regions_csv)

        pre_sent = [run_sentinel(spark) for _ in range(3)]
        t0 = time.perf_counter()
        result = cli.run(
            spark,
            src,
            out,
            output_folder_zipped=zips,
            regions_csv=regions_csv,
            bucket_name="example-products-bucket",
            s3prefix="climate/products",
            strict=True,
        )
        elapsed = time.perf_counter() - t0
        post_sent = [run_sentinel(spark) for _ in range(3)]

        n_zip_files = len(
            [f for f in os.listdir(zips) if f.endswith(".zip")]
        )
        n_meta = len([f for f in os.listdir(out) if f.endswith(".json")])
        rec = {
            "metric": "cli_e2e_sec",
            "value": round(elapsed, 3),
            "unit": "sec",
            "grids": n_grids,
            "grid_cells_total": n_cells,
            "regions": n_regions,
            "products": result["products"],
            "zips_reported": result["zips"],
            "zip_files_on_disk": n_zip_files,
            "metadata_docs": n_meta,
            "upload_targets": result.get("n_upload_targets", 0),
            "products_per_sec": round(result["products"] / elapsed, 2),
            "pipeline": "recursive .asc scan -> decode -> x regions "
            "fan-out -> clip -> stats -> naming dims -> GeoTIFF+zip+"
            "metadata sinks (strict mode)",
        }
        # trend adjudication (module docstring): bracket sentinels +
        # self-verdict against the recorded raw series
        import statistics

        sents = pre_sent + post_sent
        med = round(statistics.median(sents), 3)
        pps = rec["products_per_sec"]
        phase = round(med / _CALM_SENTINEL_SEC, 2)
        if pps >= _RAW_SERIES["r9"] * _FLAT_TOLERANCE:
            verdict = "flat_or_better"
        elif phase >= _PHASE_ELEVATED:
            verdict = "host_phase_excused"
        else:
            verdict = "drift_unexcused"
        rec["sentinel"] = {
            "pre": pre_sent,
            "post": post_sent,
            "median_sec": med,
            "calm_ref_sec": _CALM_SENTINEL_SEC,
            "phase_factor": phase,
        }
        # host-speed-invariant figure: products per sentinel-unit of CPU
        rec["products_per_sentinel"] = round(pps * med, 3)
        rec["trend"] = {
            "raw_series": _RAW_SERIES,
            "verdict_on_trend": verdict,
        }
        line = json.dumps(rec)
        print(line)
        with open(out_json, "w") as f:
            f.write(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
