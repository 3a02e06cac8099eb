#!/usr/bin/env python
"""Full-catalog HOSTILE-input parity sweep: run every oracled query
against fixtures carrying the malformed rows the generated datasets
never contain, and record a machine-readable artifact the rounds can
diff (HOSTILE_PARITY.json).

Fixtures (each sf0.001 with ONE table augmented) — malformed-row
variants plus the *_dupid identity probes (duplicate keys, repeated
full rows, NULL keys, and r8's NULL event-time):

- documents + (NULL text, '' text, whitespace-only text)
- embeddings + (NULL vector, empty vector, all-zero vector,
  NULL-element vector, Inf-element vector)
- embeddings_tiny_norm: quantized-zero-norm vectors planted at ids
  that WIN the md5 centroid draws (r11 — the draw-eligibility +
  validity-boundary probe)
- events     + (NULL user_id; NULL event_type/value/props; malformed
  JSON props)
- customer/supplier/part + (all-NULL attribute rows: NULL names,
  nation keys, balances, brands, sizes)
- orders     + (orphan NULL o_custkey; NULL status/price/date)
- lineitem   + (NULL part/supp keys and measures)
- all_empty  : EVERY table truncated to 0 rows (r9; full catalog)

Rationale: Spark and DuckDB disagree about NULL exactly where clean
data can't show it (concat_ws vs md5(NULL), explode_outer vs
unnest(NULL), NULLS FIRST vs LAST, ANSI errors vs NaN) — every red row
this sweep ever produced was a REAL latent divergence or crash (see
tests/test_hostile_parity.py for the pinned subset and the fix log).

Usage: python tools/hostile_sweep.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re  # noqa: E402

import duckdb  # noqa: E402

from geospatial_etl_pipeline_spark.oracle import compare  # noqa: E402
from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402
from geospatial_etl_pipeline_spark.sources.tables import TABLES  # noqa: E402

SRC = "/root/testdata/sf0.001"

AUGMENTS = {
    "documents": """
        SELECT * FROM read_parquet('{src}/documents.parquet')
        UNION ALL SELECT 100001, NULL,  'en', 'webcrawl', 0
        UNION ALL SELECT 100002, '',    'en', 'webcrawl', 0
        UNION ALL SELECT 100003, '   ', 'en', 'webcrawl', 3
    """,
    "embeddings": """
        SELECT * FROM read_parquet('{src}/embeddings.parquet')
        UNION ALL SELECT 200001, NULL, 0
        UNION ALL SELECT 200002, CAST([] AS FLOAT[]), 0
        UNION ALL SELECT 200003, list_transform(range(64),
                                                i -> 0.0::FLOAT), 1
        UNION ALL SELECT 200004, [0.5::FLOAT, NULL]
                         || list_transform(range(62), i -> 0.5::FLOAT), 1
        UNION ALL SELECT 200005, ['infinity'::FLOAT]
                         || list_transform(range(63), i -> 0.5::FLOAT), 1
    """,
    "customer": """
        SELECT * FROM read_parquet('{src}/customer.parquet')
        UNION ALL SELECT 980001, NULL, NULL, NULL, NULL
    """,
    "supplier": """
        SELECT * FROM read_parquet('{src}/supplier.parquet')
        UNION ALL SELECT 980001, NULL, NULL, NULL
    """,
    "part": """
        SELECT * FROM read_parquet('{src}/part.parquet')
        UNION ALL SELECT 980001, NULL, NULL, NULL, NULL, NULL
    """,
    "orders": """
        SELECT * FROM read_parquet('{src}/orders.parquet')
        UNION ALL SELECT 990001, NULL, 'O', 100.0,
                         DATE '1995-06-01', '3-MEDIUM'
        UNION ALL SELECT 990002, 1, NULL, NULL, NULL, NULL
    """,
    "lineitem": """
        SELECT * FROM read_parquet('{src}/lineitem.parquet')
        UNION ALL SELECT 990001, NULL, NULL, 1, NULL, NULL, NULL, NULL,
                         NULL, NULL, NULL
    """,
    "events": """
        SELECT * FROM read_parquet('{src}/events.parquet')
        UNION ALL SELECT 900001, TIMESTAMP '2024-01-05 12:00:00', NULL,
                         'click', 10.0, '{{"k": 1}}'
        UNION ALL SELECT 900002, TIMESTAMP '2024-01-05 12:01:00', 7,
                         NULL, NULL, NULL
        UNION ALL SELECT 900003, TIMESTAMP '2024-01-05 12:02:00', 7,
                         'purchase', 5.5, 'not json'
        UNION ALL SELECT 900004, TIMESTAMP '2024-01-05 12:03:00', 9,
                         'click', 1.0, '{{"k": "abc"}}'
        UNION ALL SELECT 900005, TIMESTAMP '2024-01-05 12:04:00', 9,
                         'click', 2.0, '{{"k": 1.5}}'
    """,
    # duplicate / NULL / repeated-row doc_ids — the identity-assumption
    # probe (r7): two DIFFERENT texts sharing doc_id 42, one IDENTICAL
    # full row repeated, and two NULL-id rows differing in every other
    # column. Every red this fixture ever produced was an oracle or
    # engine silently assuming doc_id uniqueness (q44's chimera
    # signature, dedup_clusters' dropped NULL row, the q231/q249
    # tie-break advice finding).
    "documents_dupid": """
        SELECT * FROM read_parquet('{src}/documents.parquet')
        UNION ALL SELECT 42, 'duplicate id alpha text. twice. twice.',
                         'en', 'webcrawl', 140
        UNION ALL SELECT 42, 'duplicate id beta, longer and different!',
                         'de', 'books', 990
        UNION ALL SELECT 42, 'duplicate id alpha text. twice. twice.',
                         'en', 'webcrawl', 140
        UNION ALL SELECT NULL, 'null id doc one. one again. one again.',
                         'en', 'wiki', 77
        UNION ALL SELECT NULL, 'null id doc two', NULL, 'books', 3210
    """,
    # centroid-DRAW poison (r11): vectors whose elements are nonzero
    # and finite (they PASS the validity boundary) but whose quantized
    # self-norm floors to 0 (64 * floor(1e-14 * 1e12) = 0), planted at
    # ids that out-hash the ENTIRE corpus in the md5 draw orders —
    # 300728/300413 rank #1/#2 under md5('42:'||id) (the flat/L1/q56
    # centroid draws), 300777 ranks minimal under md5('42b:'||id) (the
    # hierarchical L2 sub-centroid draw).  Without the r11 draw-
    # eligibility rule (quantized norm > 0, engine filter mirrored by
    # the oracles' dnorm/enz CTEs) each would become a centroid and
    # score 0/0 = NaN for every vector, which Spark's struct sort and
    # the SQL row_number rank on OPPOSITE ends — divergent cells.
    "embeddings_tiny_norm": """
        SELECT * FROM read_parquet('{src}/embeddings.parquet')
        UNION ALL SELECT 300728, list_transform(range(64),
                           i -> 1.0e-7::FLOAT), 0
        UNION ALL SELECT 300413, list_transform(range(64),
                           i -> (-1.0e-7)::FLOAT), 1
        UNION ALL SELECT 300777, list_transform(range(64),
                           i -> ((i % 2) * 2 - 1)::FLOAT * 1.0e-7), 2
    """,
    # the same identity probe for the vector table: duplicate vec_ids
    # with DIFFERENT embeddings (id-keyed norm/dot joins produce
    # chimera pairings if either side assumes uniqueness), one
    # identical repeated row, and NULL ids differing in label
    "embeddings_dupid": """
        SELECT * FROM read_parquet('{src}/embeddings.parquet')
        UNION ALL SELECT 7, list_transform(range(64),
                           i -> (((i * 7) % 13) / 13.0)::FLOAT), 1
        UNION ALL SELECT 7, list_transform(range(64),
                           i -> (((i * 7) % 13) / 13.0)::FLOAT), 1
        UNION ALL SELECT 7, list_transform(range(64),
                           i -> (((i * 11) % 17) / 17.0 - 0.4)::FLOAT), 3
        UNION ALL SELECT NULL, list_transform(range(64),
                           i -> (((i * 5) % 19) / 19.0 - 0.2)::FLOAT), 0
        UNION ALL SELECT NULL, list_transform(range(64),
                           i -> (((i * 3) % 23) / 23.0)::FLOAT), 2
    """,
    # identity probe for the fact spine: duplicate o_orderkey rows with
    # DIFFERENT attributes (order 42 exists in the base data — joins
    # through l_orderkey=42 must fan out identically in both engines),
    # one identical repeated row (at-least-once CDC), and a NULL key.
    "orders_dupid": """
        SELECT * FROM read_parquet('{src}/orders.parquet')
        UNION ALL SELECT 42, 7, 'O', 111.11,
                         TIMESTAMP '1995-06-01 00:00:00', '1-URGENT'
        UNION ALL SELECT 42, 7, 'O', 111.11,
                         TIMESTAMP '1995-06-01 00:00:00', '1-URGENT'
        UNION ALL SELECT 42, 9, 'F', 222.22,
                         TIMESTAMP '1997-03-02 00:00:00', '5-LOW'
        UNION ALL SELECT NULL, 8, 'F', 50.0,
                         TIMESTAMP '1996-01-01 00:00:00', '2-HIGH'
    """,
    # identity probe for the event log: an identical full row repeated
    # (at-least-once delivery), a NULL event_id (offset-less arrival),
    # and (r8) a duplicate event_id with NULL ts — the tie-break/NULL
    # ordering case the r7 fixture couldn't reach (q190 advice).
    # First run caught q190's arrival-order NULL flip.
    "events_dupid": """
        SELECT * FROM read_parquet('{src}/events.parquet')
        UNION ALL SELECT 5, TIMESTAMP '2024-01-03 09:00:00', 11,
                         'click', 2.5, '{{"k": 3}}'
        UNION ALL SELECT 5, TIMESTAMP '2024-01-03 09:00:00', 11,
                         'click', 2.5, '{{"k": 3}}'
        UNION ALL SELECT 5, NULL, 11, 'click', 1.5, '{{"k": 4}}'
        UNION ALL SELECT NULL, TIMESTAMP '2024-01-03 09:05:00', 11,
                         'purchase', 9.0, NULL
    """,
}

# fixture name → the table it augments (variants like documents_dupid
# / embeddings_tiny_norm write their base table's parquet).  The split
# is validated against the known base tables (ADVICE r11): a future
# fixture for a base table whose name contains an underscore would
# otherwise silently map to a nonexistent table and the sweep would
# write the wrong parquet.
_BASE_TABLES = frozenset({
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
})
FIXTURE_TABLE = {name: name.split("_")[0] for name in AUGMENTS}
for _fx, _tbl in FIXTURE_TABLE.items():
    if _tbl not in _BASE_TABLES:
        raise ValueError(
            f"hostile fixture {_fx!r} maps to unknown base table {_tbl!r}; "
            "add an explicit entry to FIXTURE_TABLE"
        )

# The r9 zero-row fixture: EVERY table truncated to 0 rows (schema
# preserved).  Empty-input divergence is its own class — global
# aggregates (one NULL row vs zero rows), literal spines LEFT-joined
# against nothing, driver-side scalar pulls (.first() on an empty
# frame), iterative loops whose first frontier is empty — and the
# engine hand-pins it in places (q06's coalesce(sum,0), q267's
# priority-spine LEFT JOIN) without a fixture proving the rest of the
# catalog.  Unlike the augment fixtures this one runs the FULL catalog:
# with all inputs empty, every query is "affected".
EMPTY_FIXTURE = "all_empty"

# SINGLE-ROW fixture (r10): every table truncated to exactly one row —
# the other degenerate cardinality. First run found 5 real engine
# divergences invisible to both the malformed-row and zero-row sweeps:
# quantized variance rounding NEGATIVE into DuckDB's erroring sqrt
# (q160), zero-weight bootstrap replicates dividing by zero under
# Spark ANSI (q172), scan-amplification /0 when the probe rectangle
# matches nothing (q189), SUM-over-empty NULL vs COUNT(*) 0 in the
# DSIR target totals (q219), and a +inf "no second centroid" fold
# sentinel saturating to LONG_MAX in the non-ANSI bigint cast while
# the oracle said NULL (q236). Like all_empty it runs the FULL
# catalog: one row reaches every query.
ONE_FIXTURE = "all_one"


def contract_exempt(fixture: str, name: str, spec) -> bool:
    """Identity-contract exemptions: the similarity family addresses
    vectors BY vec_id (norm lookups, IVF cells, pair relations, cluster
    assignments), so unique non-null vec_id is its documented ingest
    precondition — MEASURED, not assumed: q202's n_dup_ids/n_null_ids
    census is hash-checked on the embeddings_dupid fixture, while the
    id-keyed family runs crash-coverage-only there (their oracles and
    engines both produce id-chimera pairings on broken identity, each
    differently — fixing 13+ deep quadratic oracle CTE chains to
    tolerate an input the engine CONTRACTUALLY rejects would verify
    behavior no caller is promised). The documents table carries no
    such contract: every document query must hash-match on
    documents_dupid."""
    return (
        fixture == "embeddings_dupid"
        and "similarity" in spec.tags
        and name != "q202_embedding_validation_audit"
    )


def build_fixture(root: str, fixture: str) -> str:
    table = FIXTURE_TABLE[fixture]
    d = os.path.join(root, f"hostile_{fixture}")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != table:
            dst = os.path.join(d, f"{t}.parquet")
            if not os.path.exists(dst):
                os.symlink(f"{SRC}/{t}.parquet", dst)
    con = duckdb.connect()
    con.execute(
        f"COPY ({AUGMENTS[fixture].format(src=SRC)}) TO "
        f"'{d}/{table}.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return d


def build_empty_fixture(root: str) -> str:
    """Every table as a zero-row parquet with the source schema."""
    d = os.path.join(root, "hostile_all_empty")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"LIMIT 0) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return d


def build_one_fixture(root: str) -> str:
    """Every table truncated to exactly ONE row (ORDER BY ALL at build
    time so the surviving row is deterministic across rebuilds; both
    engines then read the same single-row file)."""
    d = os.path.join(root, "hostile_all_one")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"ORDER BY ALL LIMIT 1) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return d


def select_queries(table: str) -> tuple[list[str], list[str]]:
    """(oracled, rows_only) query names to sweep for a hostile table.

    Oracled queries are selected by a WORD-BOUNDED match of the table
    name in their oracle SQL: bare substring matching selected 'part'
    inside SPLIT_PART/PARTITION BY and 'events' inside n_events
    (wasted runs) — `_` is a word character, so \\b cuts exactly at
    real table references. Rows-only queries (oracle=None) have no SQL
    to inspect, so ALL of them are returned for crash coverage."""
    word = re.compile(rf"\b{table}\b")
    oracled = sorted(
        n for n, s in catalog.QUERIES.items()
        if s.oracle and word.search(s.oracle)
    )
    rows_only = sorted(
        n for n, s in catalog.QUERIES.items() if not s.oracle
    )
    return oracled, rows_only


def sweep_fixture(spark, fixture: str, sf_dir: str,
                  names: list[str], rows_only: list[str]) -> dict:
    """Run the oracled compares + rows-only crash coverage for one
    fixture and return its artifact entry."""
    fails: dict[str, str] = {}
    n_exempt = 0
    for name in names:
        spec = catalog.QUERIES[name]
        try:
            if contract_exempt(fixture, name, spec):
                # identity-contract exemption: crash coverage only (see
                # contract_exempt docstring); the contract itself is
                # hash-checked via q202
                spec.fn(spark, sf_dir).count()
                n_exempt += 1
            else:
                r = compare(name, spark, sf_dir, spec.fn, spec.oracle)
                if not r.ok:
                    fails[name] = str(r)[:300]
        except Exception as exc:  # noqa: BLE001 — record and go on
            fails[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# {fixture}/{name}: {'FAIL' if name in fails else 'ok'}",
              file=sys.stderr, flush=True)
    for name in rows_only:
        spec = catalog.QUERIES[name]
        try:
            spec.fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — record and go on
            fails[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# {fixture}/{name} (rows-only): "
              f"{'FAIL' if name in fails else 'ok'}",
              file=sys.stderr, flush=True)
    return {
        "checked": len(names) + len(rows_only),
        "oracled": len(names) - n_exempt,
        "contract_exempt": n_exempt,
        "rows_only": len(rows_only),
        "failed": len(fails),
        "fails": fails,
    }


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "HOSTILE_PARITY.json"
    catalog.load_all_plans()
    spark = get_spark("hostile-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    t_start = time.time()
    out: dict = {"src_sf": SRC, "fixtures": {}}
    with tempfile.TemporaryDirectory() as root:
        for table in AUGMENTS:
            sf_dir = build_fixture(root, table)
            # only queries whose ORACLE references the hostile table can
            # be affected; everything else reads identical inputs. The
            # rows-only set runs on EVERY fixture — a hostile row must
            # not kill the plan even with no oracle to diff against.
            names, rows_only = select_queries(FIXTURE_TABLE[table])
            out["fixtures"][table] = sweep_fixture(
                spark, table, sf_dir, names, rows_only
            )
        # zero-row fixture: full catalog (see EMPTY_FIXTURE rationale)
        sf_dir = build_empty_fixture(root)
        all_oracled = sorted(
            n for n, s in catalog.QUERIES.items() if s.oracle
        )
        all_rows_only = sorted(
            n for n, s in catalog.QUERIES.items() if not s.oracle
        )
        out["fixtures"][EMPTY_FIXTURE] = sweep_fixture(
            spark, EMPTY_FIXTURE, sf_dir, all_oracled, all_rows_only
        )
        # single-row fixture: full catalog (see ONE_FIXTURE rationale)
        sf_dir = build_one_fixture(root)
        out["fixtures"][ONE_FIXTURE] = sweep_fixture(
            spark, ONE_FIXTURE, sf_dir, all_oracled, all_rows_only
        )
    out["elapsed_sec"] = round(time.time() - t_start, 1)
    out["all_green"] = all(
        f["failed"] == 0 for f in out["fixtures"].values()
    )
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: {"checked": v["checked"], "failed": v["failed"]}
                      for k, v in out["fixtures"].items()}
                     | {"all_green": out["all_green"]}))


if __name__ == "__main__":
    sys.exit(main())
