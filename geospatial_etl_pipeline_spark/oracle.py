"""Differential-testing harness: Spark plan vs DuckDB oracle.

Replicates the driver's correctness gate locally so every catalog entry is
verified before the driver ever runs it: row count, schema (column names),
and an order-insensitive value comparison on identical parquet inputs.

The comparison is strict: after canonicalization (column-name sort,
row sort, NaN/None normalization) values must be EXACTLY equal — if we
pass here, any reasonable hash the driver computes will match too.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from .sources.tables import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover
        status = "OK " if self.ok else "FAIL"
        extra = ("; " + "; ".join(self.issues[:5])) if self.issues else ""
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}{extra}"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the
        # r9 scale clones); the driver testdata is single files.
        # DuckDB needs the glob for the former — row semantics are
        # identical, and Spark's reader accepts both natively.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    """Normalize a single value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    fn,
    oracle: str,
    max_mismatch_report: int = 3,
) -> CompareResult:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    issues: list[str] = []
    # External hash-based comparators choke on container-typed cells
    # (round-1 q19 failed ONLY in the driver: its hasher hit
    # `unhashable type: 'list'` while this harness tuple-ized the
    # arrays and passed). Gate-checked queries must emit scalar columns
    # only — serialize arrays/structs canonically (to_json, array_join,
    # md5) in BOTH plan and oracle.
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in sdf.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            issues.append(
                f"container-typed output column {f.name!r} "
                f"({f.dataType.simpleString()}): driver hash cannot digest "
                "it — emit a canonical scalar (to_json/array_join/md5)"
            )

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(o_cols):
        issues.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        issues.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")

    if not issues:
        cs = _canon_rows(s_cols, s_rows)
        co = _canon_rows(o_cols, o_rows)
        n_bad = 0
        for i, (a, b) in enumerate(zip(cs, co)):
            if a != b:
                n_bad += 1
                if n_bad <= max_mismatch_report:
                    issues.append(f"row {i}: spark={a!r} != oracle={b!r}")
        if n_bad:
            issues.append(f"{n_bad}/{len(cs)} canonical rows differ")

    return CompareResult(
        name=name,
        ok=not issues,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        issues=issues,
    )
