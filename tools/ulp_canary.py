#!/usr/bin/env python
"""Interpolated-percentile ULP canary (round 8, VERDICT r7 item 4).

Round 7's one driver red (q166) was an interpolated-percentile ULP:
Spark's percentile() and DuckDB's quantile_cont() agreed bit-for-bit
locally but not under the driver's engine pair — the interpolation
formula is engine-VERSION-dependent in its last ulp. Round 8 removed
the class from the catalog (plans/_util.py int_hist rank machinery);
this canary keeps it removed, and measures the environment so the next
skew shows up in the builder's sweep, not the driver's sample.

Round 9 (VERDICT r8 item 6) extends the canary from the percentile
class to the other version-fragile expression classes a hashed column
could carry:

- TRANSCENDENTALS (ln/log/log2/log10/exp/pow/power): NOT required to
  be correctly rounded by IEEE 754 — JVM Math vs C libm legitimately
  differ in the last ulp, and an engine upgrade can move either. The
  catalog's design rule (docstrings in q93/q126/q165/q217 etc.) is
  that none of these may feed a hashed column; gate 3 enforces it the
  way gate 1 enforces the percentile rule. sqrt and division are
  EXEMPT: IEEE 754 REQUIRES correct rounding for both (the q270-style
  per-symbol argument), so they are version-stable on identical
  operands.
- RAW-DOUBLE SUM/AVG (order-dependent accumulation): SUM over doubles
  is non-associative; partial-agg order differs between engines and
  across scales. The catalog's rule is decimal/quantized-integer
  laundering (dsum/qsum/msum); gate 4 scans every oracle's SUM/AVG
  arguments for un-laundered double source columns.

Runtime probes 5 and 6 (informational, never gating) measure both
classes in THIS environment: per-symbol libm bit parity between the
engines, and the order-sensitivity of a raw double SUM inside Spark
itself (1-partition vs 32-partition plans) and across engines — the
empirical evidence for why the two design rules exist.

Checks:

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
import re
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

# gate 3: transcendental calls allowed to remain, with the exactness
# argument (every entry must be integer-exact, i.e. all inputs AND
# outputs exactly representable, so "correct rounding" is vacuous)
TRANSCENDENTAL_ALLOWLIST = {
    "q257_simhash_hamming_pairs": (
        "pow(2, 8*b) for b in 0..3 CAST AS BIGINT: integer powers of "
        "two are exactly representable, any faithful pow returns them "
        "bit-exactly; used as a byte-extraction divisor"
    ),
}

# gate 4: SUM/AVG args that reference a double source column but are
# provably not accumulating raw doubles
RAWSUM_ALLOWLIST = {
    "q64_pandas_udaf_wavg": (
        "flagged SUM accumulates integer weights (1 + user_id % 10); "
        "`value` appears only inside the CASE guard predicate, never "
        "in the summed expression"
    ),
}

# double-typed columns of the source schema (what a raw SUM could leak)
DOUBLE_COLS = {
    "value", "c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
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


_TRANS_SQL = re.compile(r"\b(ln|log|log2|log10|exp|pow|power)\s*\(", re.I)
_TRANS_FUNCS = {"log", "log2", "log10", "log1p", "exp", "expm1", "pow",
                "power"}


def _source_uses_transcendental(src: str) -> list[str]:
    """AST scan mirroring _source_uses_percentile: F.log/F.exp/... calls
    and transcendental tokens inside SQL-string call arguments.
    Docstrings and comments never match (they are not call args)."""
    hits: list[str] = []
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return hits
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        called = (
            fn.attr if isinstance(fn, ast.Attribute)
            else fn.id if isinstance(fn, ast.Name) else ""
        )
        if called in _TRANS_FUNCS:
            hits.append(f"call:{called}")
        for arg in list(node.args) + [kw.value for kw in node.keywords]:
            texts = []
            if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                texts.append(arg.value)
            if isinstance(arg, ast.JoinedStr):
                texts += [p.value for p in arg.values
                          if isinstance(p, ast.Constant)
                          and isinstance(p.value, str)]
            for s in texts:
                for m in _TRANS_SQL.finditer(s):
                    hits.append(f"sql_arg:{m.group(1).lower()}")
    return sorted(set(hits))


def transcendental_flags() -> dict[str, list[str]]:
    """Gate 3: oracled queries whose oracle SQL or plan source calls a
    non-correctly-rounded libm function (see module docstring)."""
    out: dict[str, list[str]] = {}
    for name, spec in sorted(catalog.QUERIES.items()):
        if not spec.oracle:
            continue  # rows-only queries never feed a hashed column
        hits = [f"oracle:{m.group(1).lower()}"
                for m in _TRANS_SQL.finditer(spec.oracle)]
        try:
            src = inspect.getsource(spec.fn)
        except OSError:
            src = ""
        hits += [f"source:{h}" for h in _source_uses_transcendental(src)]
        if hits:
            out[name] = sorted(set(hits))
    return out


def _sum_avg_args(sql: str) -> list[tuple[str, str]]:
    """Extract (SUM|AVG, argument-text) pairs by paren matching."""
    out = []
    for m in re.finditer(r"\b(SUM|AVG)\s*\(", sql, re.I):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.append((m.group(1).upper(), sql[m.end():i - 1]))
    return out


def rawsum_flags() -> dict[str, list[str]]:
    """Gate 4: oracle SUM/AVG arguments that reference a double source
    column without decimal/integer laundering (DECIMAL / HUGEINT /
    BIGINT cast / COUNT within the argument)."""
    safe = re.compile(r"DECIMAL|HUGEINT|::\s*BIGINT|AS\s+BIGINT|COUNT", re.I)
    word = re.compile(r"[a-z_][a-z_0-9]*", re.I)
    out: dict[str, list[str]] = {}
    for name, spec in sorted(catalog.QUERIES.items()):
        if not spec.oracle:
            continue
        bad = []
        for kind, arg in _sum_avg_args(spec.oracle):
            if safe.search(arg):
                continue
            toks = {w.lower() for w in word.findall(arg)}
            if toks & DOUBLE_COLS:
                bad.append(f"{kind}({arg.strip()[:80]})")
        if bad:
            out[name] = bad
    return out


def libm_parity(spark) -> dict:
    """Probe 5: per-symbol bit parity of libm functions between the
    engines over real event values. sqrt is IEEE-required correct
    rounding (expect 0 mismatches); ln/exp/pow/log2 are not — any
    nonzero count is the empirical justification for gate 3."""
    sel = (
        "ln(value + 1.0) AS f_ln, exp(value / 1000.0) AS f_exp, "
        "power(value + 1.0, 1.5) AS f_pow, sqrt(value) AS f_sqrt, "
        "log2(value + 1.0) AS f_log2"
    )
    where = "value IS NOT NULL AND value >= 0 AND event_id IS NOT NULL"
    sdf = spark.sql(
        f"SELECT event_id, {sel} FROM parquet.`{SF}/events.parquet` "
        f"WHERE {where} ORDER BY event_id"
    ).collect()
    con = duckdb.connect()
    ddf = con.execute(
        f"SELECT event_id, {sel} FROM read_parquet("
        f"'{SF}/events.parquet') WHERE {where} ORDER BY event_id"
    ).fetchall()
    con.close()
    syms = ["f_ln", "f_exp", "f_pow", "f_sqrt", "f_log2"]
    mism = dict.fromkeys(syms, 0)
    n = 0
    for srow, drow in zip(sdf, ddf):
        if srow["event_id"] != drow[0]:
            continue
        n += 1
        for i, s in enumerate(syms):
            if bits(srow[s]) != bits(drow[i + 1]):
                mism[s] += 1
    return {"rows_compared": n, "bit_mismatches": mism}


def sum_order_probe(spark) -> dict:
    """Probe 6: order sensitivity of a raw double SUM — the same rows
    summed through a 1-partition plan, a 64-partition hash-shuffled
    plan, and DuckDB. Any bit difference is the empirical justification
    for gate 4 (and for dsum/qsum/msum laundering)."""
    from pyspark.sql import functions as F

    sf_probe = "/root/testdata/sf0.01"  # more rows -> more reordering
    e = spark.read.parquet(f"{sf_probe}/events.parquet")
    v1 = e.coalesce(1).agg(F.sum("value")).first()[0]
    v64 = (
        e.repartition(64, "event_id").agg(F.sum("value")).first()[0]
    )
    con = duckdb.connect()
    vd = con.execute(
        f"SELECT SUM(value) FROM read_parquet("
        f"'{sf_probe}/events.parquet')"
    ).fetchone()[0]
    con.close()
    return {
        "sf_dir": sf_probe,
        "spark_1part": bits(v1),
        "spark_64part": bits(v64),
        "duckdb": bits(vd),
        "spark_order_stable": bits(v1) == bits(v64),
        "cross_engine_equal": bits(v1) == bits(vd),
    }


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
    trans = transcendental_flags()
    trans_violations = {
        n: h for n, h in trans.items() if n not in TRANSCENDENTAL_ALLOWLIST
    }
    rawsum = rawsum_flags()
    rawsum_violations = {
        n: h for n, h in rawsum.items() if n not in RAWSUM_ALLOWLIST
    }
    spark = get_spark("ulp-canary")
    spark.sparkContext.setLogLevel("ERROR")
    parity = bit_parity(spark)
    result = {
        "allowlist_ok": not violations,
        "violations": violations,
        "allowlisted": {n: ALLOWLIST[n] for n in flagged if n in ALLOWLIST},
        "bit_parity": parity,
        "transcendental": {
            "ok": not trans_violations,
            "violations": trans_violations,
            "allowlisted": {n: TRANSCENDENTAL_ALLOWLIST[n]
                            for n in trans if n in TRANSCENDENTAL_ALLOWLIST},
        },
        "raw_double_sum": {
            "ok": not rawsum_violations,
            "violations": rawsum_violations,
            "allowlisted": {n: RAWSUM_ALLOWLIST[n]
                            for n in rawsum if n in RAWSUM_ALLOWLIST},
        },
        "libm_parity": libm_parity(spark),
        "sum_order": sum_order_probe(spark),
    }
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({
        "allowlist_ok": result["allowlist_ok"],
        "violations": violations,
        "transcendental_ok": result["transcendental"]["ok"],
        "raw_double_sum_ok": result["raw_double_sum"]["ok"],
    }, indent=2))
    print("bit parity:", parity["per_frac_bit_equal"])
    print("libm mismatches:", result["libm_parity"]["bit_mismatches"])
    print("sum order:", {k: result["sum_order"][k] for k in
                         ("spark_order_stable", "cross_engine_equal")})
    if violations or trans_violations or rawsum_violations:
        print("ULP CANARY FAILED: a version-fragile float class "
              "re-entered the catalog", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
