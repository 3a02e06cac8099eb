#!/usr/bin/env python
"""Seed-deterministic synthetic clones of the driver testdata schema at
arbitrary scale factors, generated DISTRIBUTED with Spark itself.

Purpose (r8 verdict, next-round item 1): the engine has only ever run at
sf<=0.1 (17 MB).  Plan-shape tests pin exchange/broadcast budgets, but
nothing empirical rules out a hidden super-linearity (LSH bucket
occupancy growth, posting-list cap interactions, window-state blowup).
This tool materializes sf0.1/sf0.3/sf1.0 clones so tools/scale_curve.py
can measure per-query scaling exponents.

Fidelity contract: MATCHED SCHEMA + MATCHED DISTRIBUTION SHAPE, not
byte-identity with the driver generator (seed 42's stream is private to
the driver).  Each column reproduces the observed driver distribution at
sf0.1: key ranges scale linearly, category frequencies are uniform over
the same value sets, `documents` uses the identical 31-word vocabulary
with 10..100-word uniform lengths plus a ~1% exact-dup block structure,
`embeddings` are unit-normalized 64-dim vectors clustered on 10 label
centroids, `events.value` is Exp(mean 50) like the observed tail
(p50 34.8 / p90 114 / p99 228), `lineitem` hash-assigns l_orderkey so
lines-per-order is Binomial(4n,1/n)~Poisson(4) (observed: avg 4.075,
max 17, ~1.8% childless orders).  Determinism comes from xxhash64 over
(row id, column tag) — no RNG state, so any row is reproducible in
isolation and generation parallelizes embarrassingly.

Scale design notes (the generator itself must survive 100x): every
column is a closed-form expression of `id` — `spark.range(n)` partitions
the id space, each executor writes its slice, zero shuffles except the
single repartition that sets output file count.  At 100 TB you would
raise `numPartitions` and point `--out` at object storage; nothing else
changes.

Usage:
    python tools/gen_scale_data.py 0.3 [--out /root/repo/.scaledata]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402

# Observed driver vocabulary at sf0.1 (31 words, sorted).
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = ["en", "de", "es", "fr", "zh"]  # en ~41%, rest ~14.75% each
ADJ = ["large", "hot", "blue", "old", "cold", "red", "small", "dark"]
NOUN = ["ring", "bolt", "plate", "screw", "washer", "gear", "rod", "cap"]

_U_MOD = 2**31  # uniform lattice denominator


def _u(tag: str, *cols) -> F.Column:
    """Deterministic uniform double in [0, 1) from xxhash64(cols, tag)."""
    h = F.xxhash64(F.lit(tag), *cols)
    return (F.pmod(h, F.lit(_U_MOD))).cast("double") / F.lit(float(_U_MOD))


def _pick(tag: str, values: list[str], *cols) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.floor(_u(tag, *cols) * len(values)) + 1).cast("int"))


def _money(tag: str, lo: float, hi: float, *cols) -> F.Column:
    return F.round(F.lit(lo) + _u(tag, *cols) * F.lit(hi - lo), 2)


def rows_at(sf: float) -> dict[str, int]:
    """Linear extrapolation of the sf0.1 driver row counts."""
    m = sf / 0.1
    return {
        "customer": int(15_000 * m),
        "supplier": int(1_000 * m),
        "part": int(20_000 * m),
        "orders": int(150_000 * m),
        "lineitem": int(600_000 * m),
        "events": int(100_000 * m),
        "documents": int(5_000 * m),
        "embeddings": int(2_000 * m),
    }


def _parts_for(n_rows: int) -> int:
    # ~250k rows per output task: small tables stay single-file like the
    # driver's, big ones parallelize generation and later scans.
    return max(1, math.ceil(n_rows / 250_000))


def gen_tables(spark: SparkSession, sf: float) -> dict[str, DataFrame]:
    n = rows_at(sf)
    iid = F.col("id")

    region = spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey INT, r_name STRING"
    )
    nation = spark.range(25).select(
        iid.cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), iid.cast("string")).alias("n_name"),
        (iid % 5).cast("int").alias("n_regionkey"),
    )
    customer = spark.range(n["customer"], numPartitions=_parts_for(n["customer"])).select(
        iid.alias("c_custkey"),
        F.format_string("Customer#%09d", iid).alias("c_name"),
        F.floor(_u("c_nat", iid) * 25).cast("int").alias("c_nationkey"),
        _money("c_bal", -1000.0, 10000.0, iid).alias("c_acctbal"),
        _pick("c_seg", SEGMENTS, iid).alias("c_mktsegment"),
    )
    supplier = spark.range(n["supplier"], numPartitions=_parts_for(n["supplier"])).select(
        iid.alias("s_suppkey"),
        F.format_string("Supplier#%09d", iid).alias("s_name"),
        F.floor(_u("s_nat", iid) * 25).cast("int").alias("s_nationkey"),
        _money("s_bal", 0.0, 10000.0, iid).alias("s_acctbal"),
    )
    part = spark.range(n["part"], numPartitions=_parts_for(n["part"])).select(
        iid.alias("p_partkey"),
        F.concat(
            _pick("p_adj", ADJ, iid), F.lit(" "), _pick("p_noun", NOUN, iid)
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"), (F.floor(_u("p_brand", iid) * 25) + 1).cast("string")
        ).alias("p_brand"),
        _pick("p_type", PTYPES, iid).alias("p_type"),
        (F.floor(_u("p_size", iid) * 50) + 1).cast("int").alias("p_size"),
        # observed driver pattern: 900.0 + (id % 1000)/10
        (F.lit(900.0) + (iid % 1000).cast("double") / 10.0).alias("p_retailprice"),
    )
    base_date = F.to_timestamp(F.lit("1995-01-01"))
    orders = spark.range(n["orders"], numPartitions=_parts_for(n["orders"])).select(
        iid.alias("o_orderkey"),
        F.floor(_u("o_cust", iid) * n["customer"]).alias("o_custkey"),
        _pick("o_stat", STATUSES, iid).alias("o_orderstatus"),
        _money("o_total", 1000.0, 500000.0, iid).alias("o_totalprice"),
        F.timestamp_add(
            "DAY", F.floor(_u("o_date", iid) * 2405).cast("int"), base_date
        ).alias("o_orderdate"),
        _pick("o_prio", PRIORITIES, iid).alias("o_orderpriority"),
    )
    lineitem = spark.range(n["lineitem"], numPartitions=_parts_for(n["lineitem"])).select(
        F.floor(_u("l_ord", iid) * n["orders"]).alias("l_orderkey"),
        F.floor(_u("l_part", iid) * n["part"]).alias("l_partkey"),
        F.floor(_u("l_supp", iid) * n["supplier"]).alias("l_suppkey"),
        (F.floor(_u("l_line", iid) * 7) + 1).cast("int").alias("l_linenumber"),
        (F.floor(_u("l_qty", iid) * 50) + 1).cast("double").alias("l_quantity"),
        _money("l_price", 900.0, 105000.0, iid).alias("l_extendedprice"),
        (F.floor(_u("l_disc", iid) * 11) / 100.0).alias("l_discount"),
        (F.floor(_u("l_tax", iid) * 9) / 100.0).alias("l_tax"),
        _pick("l_rf", ["A", "N", "R"], iid).alias("l_returnflag"),
        _pick("l_ls", ["F", "O"], iid).alias("l_linestatus"),
        F.timestamp_add(
            "DAY", F.floor(_u("l_ship", iid) * 2498).cast("int") + 1, base_date
        ).alias("l_shipdate"),
    )
    ev_base = F.to_timestamp(F.lit("2024-01-01"))
    events = spark.range(n["events"], numPartitions=_parts_for(n["events"])).select(
        iid.alias("event_id"),
        F.timestamp_add(
            "SECOND",
            F.floor(_u("e_ts", iid) * (30 * 86400)).cast("long"),
            ev_base,
        ).alias("ts"),
        F.floor(_u("e_user", iid) * max(n["customer"] // 10, 1)).alias("user_id"),
        _pick("e_type", ETYPES, iid).alias("event_type"),
        # Exp(50): matches observed p50 34.8 / p90 114 / p99 228 / max ~560
        F.round(F.least(-F.lit(50.0) * F.log(F.lit(1.0) - _u("e_val", iid)), F.lit(999.0)), 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.floor(_u("e_k", iid) * 100).cast("int")
        ).alias("props"),
    )

    # documents: ~1% of docs draw their text from a 50-doc block seed
    # instead of their own id, producing exact-dup groups (observed driver
    # rate at sf0.1: 8 groups / 16 members in 5000 docs).
    text_seed = F.when(
        _u("d_dup", iid) < 0.01, (iid - F.pmod(iid, F.lit(50)))
    ).otherwise(iid)
    n_words = (F.floor(_u("d_len", text_seed) * 91) + 10).cast("int")
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda w: F.element_at(
            vocab_arr,
            (F.pmod(F.xxhash64(F.lit("d_word"), text_seed, w), F.lit(31)) + 1).cast("int"),
        ),
    )
    documents = spark.range(n["documents"], numPartitions=_parts_for(n["documents"])).select(
        iid.alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        # en-heavy mix like the driver: ~41% en, rest uniform
        F.when(_u("d_lang", iid) < 0.41, F.lit("en"))
        .otherwise(_pick("d_lang2", LANGS[1:], iid))
        .alias("lang"),
        F.concat(
            F.lit("src"), F.floor(_u("d_src", iid) * 20).cast("string")
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))

    # embeddings: centroid(label) + noise, L2-normalized, 64-dim float
    label = F.floor(_u("v_lab", iid) * 10).cast("int")
    dims = F.sequence(F.lit(0), F.lit(63))
    raw = F.transform(
        dims,
        lambda j: (_u_expr("v_cent", label, j) - 0.5)
        + (_u_expr("v_noise", iid, j) - 0.5) * 0.4,
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
    embeddings = spark.range(n["embeddings"], numPartitions=_parts_for(n["embeddings"])).select(
        iid.alias("vec_id"), raw.alias("_raw"), norm.alias("_n"), label.alias("label")
    ).select(
        "vec_id",
        F.transform(F.col("_raw"), lambda x: (x / F.col("_n")).cast("float")).alias("embedding"),
        "label",
    )

    return {
        "region": region, "nation": nation, "customer": customer,
        "supplier": supplier, "part": part, "orders": orders,
        "lineitem": lineitem, "events": events, "documents": documents,
        "embeddings": embeddings,
    }


def _u_expr(tag: str, *cols) -> F.Column:
    """_u for use inside higher-order lambdas (same formula)."""
    h = F.xxhash64(F.lit(tag), *cols)
    return (F.pmod(h, F.lit(_U_MOD))).cast("double") / F.lit(float(_U_MOD))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    out_root = "/root/repo/.scaledata"
    if "--out" in sys.argv:
        out_root = sys.argv[sys.argv.index("--out") + 1]
    out_dir = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in gen_tables(spark, sf).items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        print(f"# wrote {path}", file=sys.stderr, flush=True)
    print(out_dir)


if __name__ == "__main__":
    main()
