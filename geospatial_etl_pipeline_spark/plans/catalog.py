"""Central query catalog: every implemented operator registers here.

Each entry pairs a Spark DataFrame plan builder with an ANSI-SQL oracle
string (DuckDB-runnable on the same parquet tables). The driver contract
(``/root/repo/__spark_entry__.py``) exposes this registry verbatim, and
``tests/test_oracle_parity.py`` differentially tests every pair locally
before the driver ever sees it.

Determinism rules for oracle-matched queries (learned the hard way once,
encoded forever):

1. **No raw double aggregation.** Summing doubles is order-dependent and
   Spark's merge order is nondeterministic across runs. Monetary/metric
   aggregates go through ``CAST(x AS DECIMAL(38,6))`` in BOTH engines —
   exact arithmetic, deterministic — then cast back to DOUBLE for a
   stable, scale-free wire type.
2. **Alias everything** — the driver sorts columns by name before
   hashing; Spark and oracle column names must match exactly.
3. **Total order within ties is irrelevant** (driver hash is
   order-insensitive) but LIMIT/top-k queries must break ties
   deterministically in BOTH engines (add a unique key to the sort).
4. **UTC everywhere**; timestamps compare as instants.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver falls back to rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # For rows-only entries whose DATAFLOW is fully hash-checked by a
    # companion query (same operators, engine-reproducible parameters):
    # the companion's name. e.g. q54 (Gaussian-plane production ANN) is
    # oracle-twinned by q84 (md5-plane variant of the identical bucket
    # join + re-rank, value-hash-checked end to end).
    oracle_twin: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    oracle_twin: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame plan builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or ""),
            oracle_twin=oracle_twin,
        )
        return fn

    return deco


def load_all_plans() -> None:
    """Import every plan module so registration side effects run."""
    from . import (  # noqa: F401
        dedup,
        events,
        extra,
        geometry,
        multimodal,
        raster,
        ref_parity,
        relational,
        sampling,
        similarity,
        text,
    )
