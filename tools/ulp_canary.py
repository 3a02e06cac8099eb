#!/usr/bin/env python
"""Interpolated-percentile ULP canary (round 8, VERDICT r7 item 4).

Round 7's one driver red (q166) was an interpolated-percentile ULP:
Spark's percentile() and DuckDB's quantile_cont() agreed bit-for-bit
locally but not under the driver's engine pair — the interpolation
formula is engine-VERSION-dependent in its last ulp. Round 8 removed
the class from the catalog (plans/_util.py int_hist rank machinery);
this canary keeps it removed, and measures the environment so the next
skew shows up in the builder's sweep, not the driver's sample.

Two checks:

1. ALLOWLIST (the gate — exit 1 on violation): every catalog query
   whose oracle SQL uses quantile_cont(, or whose plan source calls
   F.percentile( / percentile(, must be on the documented allowlist:
     - q200_corpus_scorecard: median at f=1/2 over INTEGER-valued
       doubles < 2^52 — every interpolation intermediate is exactly
       representable, so any correct implementation returns identical
       bits regardless of engine version (docstring proof).
     - q29_sketch_aggregates: rows-only by construction; the exact
       percentile window only feeds *_within_bound booleans asserted
       in pytest, never a hashed oracle column.

2. BIT PARITY (informational — recorded, never gating): evaluate the
   same interpolated percentiles at several fractions in BOTH engines
   over events.value at sf0.001 and record byte-level equality per
   fraction. If this environment's engine pair ever starts to skew,
   the artifact says exactly where — without the catalog depending
   on it.

Usage: python tools/ulp_canary.py [out_json]   (default ULP_CANARY.json)
"""

from __future__ import annotations

import ast
import inspect
import json
import os
import struct
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
FRACS = [0.25, 0.5, 0.75, 0.9, 0.99]

ALLOWLIST = {
    # name -> why the interpolated percentile is allowed to remain
    "q200_corpus_scorecard": (
        "f=1/2 over integer-valued doubles: all interpolation "
        "intermediates exactly representable -> version-independent"
    ),
    "q29_sketch_aggregates": (
        "rows-only; exact percentile only feeds *_within_bound "
        "booleans pinned in pytest, never a hashed column"
    ),
}


def _source_uses_percentile(src: str) -> bool:
    """AST check: a Call to an attribute/name `percentile`, or a string
    literal CONTAINING 'percentile(' passed as an argument to any call
    (F.expr / spark.sql SQL fragments) — docstrings and comments never
    match. approx_percentile / percentile_approx are exempt (sketches,
    not interpolation)."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return "F.percentile(" in src
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        called = (
            fn.attr if isinstance(fn, ast.Attribute)
            else fn.id if isinstance(fn, ast.Name) else ""
        )
        if called == "percentile":
            return True
        for arg in list(node.args) + [kw.value for kw in node.keywords]:
            if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                s = arg.value.replace("approx_percentile", "").replace(
                    "percentile_approx", ""
                )
                if "percentile(" in s:
                    return True
            if isinstance(arg, ast.JoinedStr):
                for part in arg.values:
                    if isinstance(part, ast.Constant) and isinstance(
                        part.value, str
                    ):
                        s = part.value.replace(
                            "approx_percentile", ""
                        ).replace("percentile_approx", "")
                        if "percentile(" in s:
                            return True
    return False


def flagged_queries() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name, spec in sorted(catalog.QUERIES.items()):
        hits = []
        if spec.oracle and "quantile_cont" in spec.oracle:
            hits.append("oracle:quantile_cont")
        try:
            src = inspect.getsource(spec.fn)
        except OSError:
            src = ""
        if _source_uses_percentile(src):
            hits.append("source:percentile")
        if hits:
            out[name] = hits
    return out


def bits(x: float | None) -> str | None:
    if x is None:
        return None
    return struct.pack("<d", float(x)).hex()


def bit_parity(spark) -> dict:
    fr = ", ".join(repr(f) for f in FRACS)
    sdf = spark.sql(
        f"SELECT event_type, percentile(value, array({fr})) AS ps "
        f"FROM parquet.`{SF}/events.parquet` GROUP BY event_type "
        # r9 (ADVICE r8): Spark sorts NULLs first ascending, DuckDB last —
        # pin NULLS FIRST on both sides so a NULL event_type group can't
        # misalign the zip below.
        "ORDER BY event_type ASC NULLS FIRST"
    ).collect()
    con = duckdb.connect()
    ddf = con.execute(
        f"SELECT event_type, quantile_cont(value, [{fr}]) AS ps "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type "
        "ORDER BY event_type ASC NULLS FIRST"
    ).fetchall()
    con.close()
    per_frac = {repr(f): True for f in FRACS}
    mismatches = []
    for srow, drow in zip(sdf, ddf):
        for i, f in enumerate(FRACS):
            sb, db = bits(srow["ps"][i]), bits(drow[1][i])
            if sb != db:
                per_frac[repr(f)] = False
                mismatches.append(
                    {"event_type": srow["event_type"], "frac": f,
                     "spark": sb, "duckdb": db}
                )
    return {"per_frac_bit_equal": per_frac, "mismatches": mismatches}


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "ULP_CANARY.json"
    catalog.load_all_plans()
    flagged = flagged_queries()
    violations = {
        n: hits for n, hits in flagged.items() if n not in ALLOWLIST
    }
    spark = get_spark("ulp-canary")
    spark.sparkContext.setLogLevel("ERROR")
    parity = bit_parity(spark)
    result = {
        "allowlist_ok": not violations,
        "violations": violations,
        "allowlisted": {n: ALLOWLIST[n] for n in flagged if n in ALLOWLIST},
        "bit_parity": parity,
    }
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("allowlist_ok", "violations")}, indent=2))
    print("bit parity:", parity["per_frac_bit_equal"])
    if violations:
        print("ULP CANARY FAILED: de-floated class re-entered the catalog",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
