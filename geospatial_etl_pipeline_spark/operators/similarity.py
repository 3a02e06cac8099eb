"""Similarity-search operators over embedding columns.

Two tiers (SURVEY §2j, driver north star "similarity search"):

- ``brute_force_topk``: exact cosine top-k of every query vector against
  the corpus. Query side broadcasts; per-pair dot products are pure JVM
  higher-order expressions (zip_with + aggregate fold — no Python, no
  shuffle until the final per-query top-k window). Exact, O(|Q|·|C|·d).
- ``random_hyperplane_buckets`` / ``lsh_ann_topk``: sign-LSH
  (SimHash-style) approximate path: project every vector onto `nbits`
  fixed random hyperplanes (seeded, reproducible), bucket by the sign
  bitstring, and only score candidates sharing a bucket in at least one
  of ``ntables`` independent tables. Turns ANN into an equi-join on
  (table, bucket) — the 100 TB shape: shuffle is bounded by bucket
  occupancy, never |Q|×|C|.

Recall/cost dial: nbits ↑ → smaller buckets, fewer candidates, lower
recall; ntables ↑ → recall recovers at linear cost. Tested against the
brute-force oracle in tests/test_similarity_ops.py.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


_QSCALE = 1e12  # shared with plans/similarity._S — the oracle quantizer


def quantized_dot(a, b):
    """Order-independent ENGINE-EXACT dot product: per-element
    floor((x*y)*1e12) -> BIGINT, exact integer sum — associative, so
    any reduction order (and any engine) gives the same bits. Twin of
    plans/similarity._qdot (defined here too because plans import
    operators, never the reverse). Overflow contract: |x*y|*1e12 per
    element and the per-vector sum must stay under 2^63 — unit-ish
    embeddings at any dimensionality < 1e6 are orders of magnitude
    inside it (bounded-group qsum class, SCALING.md)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.floor(x * y * F.lit(_QSCALE)).cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cosine_sim, rn).

    The query side is broadcast (small by contract); ties break on
    vec_id so results are total-ordered and reproducible.
    """
    # norms staged per ROW below the join (r12): inside the pair
    # projection each _norm fold re-ran per (corpus x query) pair —
    # same expression on the same row, so the staged value is
    # bit-identical and only the evaluation site moves.
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).select(F.col(id_col), "_v", _norm(F.col("_v")).alias("_nv"))
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_q")
    ).select(F.col(query_id_col), "_q", _norm(F.col("_q")).alias("_nq"))
    sim = (
        c.crossJoin(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            (_dot(F.col("_v"), F.col("_q"))
             / (F.col("_nv") * F.col("_nq"))).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        sim.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def hyperplanes(dim: int, nbits: int, ntables: int, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic random hyperplanes: ntables × nbits × dim floats."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]
        for _ in range(ntables)
    ]


def random_hyperplane_buckets(
    df: DataFrame,
    planes: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Append (table_id, bucket) rows: one output row per input×table.

    bucket = the sign bitstring of the vector against each table's
    hyperplanes, computed on the Arrow-vectorized path: per batch, ONE
    (n, dim) @ (dim, ntables·nbits) numpy matmul + a sign test — the
    sanctioned Pandas-UDF shape for dense linear algebra. The previous
    JVM form (nested transforms over a 3-D array literal) was
    algebraically identical but ran as interpreted higher-order
    expressions: ~1.0 s vs 0.23 s at sf0.1 for the projection alone,
    and the gap grows with ntables·nbits·dim. Sign agreement with the
    per-element fold is robust (Gaussian planes put |dot| far above FP
    reassociation error; verified bit-identical on the test corpus)."""
    import pandas as _pd
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    import numpy as _np

    P = _np.asarray(planes, dtype=_np.float64)
    ntables, nbits, _dim = P.shape
    M = P.reshape(ntables * nbits, _dim).T

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("table_id", IntegerType(), False),
            StructField(out_col, StringType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                empty = pdf.copy()
                empty["table_id"] = _pd.Series([], dtype="int32")
                empty[out_col] = _pd.Series([], dtype="object")
                yield empty
                continue
            V = _np.stack(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            bits = (V @ M) >= 0
            strs = _np.where(bits.reshape(len(pdf), ntables, nbits), "1", "0")
            frames = []
            for t in range(ntables):
                f = pdf.copy()
                f["table_id"] = t
                f[out_col] = ["".join(r) for r in strs[:, t, :]]
                frames.append(f)
            yield _pd.concat(frames)

    return df.mapInPandas(run, out_schema)


def sampled_centroids(
    df: DataFrame,
    ncells: int,
    id_col: str,
    vec_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic *sampled* coarse-quantizer centroids:
    (cent_id, _c) — the ``ncells`` rows ranking smallest under
    ``md5(seed || ':' || id)``, i.e. a seeded uniform pseudo-random draw
    expressible identically in any engine with md5 (so the whole index
    build stays oracle-checkable).

    Scale shape: ``orderBy(h).limit(n)`` compiles to
    TakeOrderedAndProject — a per-partition partial top-k merged at the
    driver (O(rows·log ncells) map-side, ncells rows moved per
    partition), NOT a full sort/exchange of the corpus. cent_id
    numbering then windows over only the ncells survivors. Asserted in
    tests/test_plan_shapes.py.

    Draw eligibility (r11): zero-norm / NULL / empty / NULL-element
    vectors are EXCLUDED from the draw (quantized self-dot must be a
    positive integer).  A degenerate centroid scores 0/0 = NaN for
    every vector, and Spark's struct sort places NaN last while the
    SQL oracle's row_number ranks it first — the engines would assign
    different cells.  The filter is map-side (inside the TakeOrdered
    scan) and mirrored verbatim in every oracle's draw CTE (the
    null-propagating ``dnorm``/``enz`` relations); the
    embeddings_zero_centroid hostile fixture forces a degenerate
    vector into md5-rank range to prove parity."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("_cid").cast("string")))
    picked = (
        df.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_c"))
        .filter(quantized_dot(F.col("_c"), F.col("_c")) > 0)
        .withColumn("_h", h)
        .orderBy("_h", "_cid")
        .limit(ncells)
    )
    w_cent = Window.orderBy("_h", "_cid")
    return picked.select(
        (F.row_number().over(w_cent) - 1).alias("cent_id"), "_c"
    )


def auto_ncells(corpus_rows: int, nprobe: int = 4, nassign: int = 1) -> int:
    """√n dial for the IVF cell count (classic IVF sizing): cells ≈ √n
    keeps both the per-cell candidate list (~√n) and the join-key
    cardinality (√n distinct cent_ids) growing with the corpus, so the
    cand equi-join on cent_id never concentrates a 100 TB corpus into a
    handful of partitions. Floor at 4×nprobe so probing stays selective.

    ``nassign`` re-balances for multi-assignment (r11): at FIXED ncells,
    assigning each vector to its top-k cells multiplies candidate pairs
    by ~k²; sizing ncells = k·√n restores ~√n expected occupancy so
    BOTH the assignment scan (n·ncells·d) and the pair work
    (ncells·(n·k/ncells)²) scale LINEARLY in k — measured on the 21k
    clustered fixture: candidate pairs 2.61M → 5.48M (2.1×) going
    nassign 1 → 2 under this rule (NEARDUP_RECALL, r11)."""
    import math

    return max(4 * nprobe, nassign * int(math.isqrt(max(corpus_rows, 1))))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ncells: int | None = None,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``ncells`` Voronoi cells around coarse centroids, probe only the
    ``nprobe`` cells nearest each query, exact-cosine re-rank within the
    probed cells. Returns (query_id, vec_id, cosine_sim, rn).

    The coarse quantizer is a seeded *sampled* pick
    (:func:`sampled_centroids` — md5-ranked partial top-k, no full sort,
    no dependence on id distribution), so the whole index build is a
    relational plan (no iterative training step); a production build
    swaps in k-means|| centroids with the identical downstream shape.

    ``ncells=None`` applies the √n dial (:func:`auto_ncells`) using the
    ``corpus_rows`` hint if given, else ONE count job at index-build
    time (parquet footer metadata — cheap, and an index build is a
    once-per-corpus cost). Fixed small ncells is the scale-killer the
    dial exists to avoid: a 16-value cent_id join key funnels the corpus
    into 16 partitions; √n keys keep the shuffle even.

    Scale shape: centroid assignment is a broadcast of ONE struct-array
    row + in-row argmax fold (map-side only), candidate generation is an
    equi-join on cent_id (~√n distinct keys), re-ranking touches
    ~nprobe/ncells of the corpus instead of all of it.
    """
    if ncells is None:
        n = corpus_rows if corpus_rows is not None else corpus.count()
        ncells = auto_ncells(n, nprobe)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cents = sampled_centroids(c, ncells, id_col, "_v", seed=seed)
    # all centroids as ONE broadcast row; assignment is an in-row argmax
    # fold (struct(-score, cent_id) ascending == score DESC, cent_id ASC)
    # instead of crossJoin(x ncells) + window — which shuffled and sorted
    # corpus x ncells rows just to pick each row's best centroid
    # each centroid's norm computed ONCE into the broadcast struct (r12)
    # — inside the argmax transform it re-ran the O(d) fold per
    # (row x centroid); the trailing struct field leaves the array_sort
    # order (keyed on the leading distinct cent_id) unchanged.
    carr = cents.agg(
        F.array_sort(
            F.collect_list(
                F.struct("cent_id", "_c", _norm(F.col("_c")).alias("_nc"))
            )
        ).alias("_cents")
    )

    def _assign(df, idc, vc, keep_n, payload=()):
        scored = F.transform(
            F.col("_cents"),
            lambda ct: F.struct(
                (-(_dot(F.col(vc), ct["_c"]) / ct["_nc"])).alias(
                    "negscore"
                ),
                ct["cent_id"].alias("cent_id"),
            ),
        )
        top = F.slice(F.array_sort(scored), 1, keep_n)
        return (
            df.crossJoin(F.broadcast(carr))
            .select(F.col(idc), *payload, F.explode(top).alias("_t"))
            .select(idc, *payload, F.col("_t.cent_id").alias("cent_id"))
        )

    # The corpus vector rides THROUGH the assignment as payload and the
    # (queries × nprobe)-row qcells side is broadcast: the corpus is
    # scanned once, never exchanged, never re-joined — candidate
    # generation + exact re-rank happen in the same map-side pipeline,
    # and the only shuffle in the whole operator is the final per-query
    # top-k window (WindowGroupLimit pre-prunes each partition to k).
    # per-row norms ride the assignment as payload (r12): in the
    # re-rank projection they re-ran the O(d) fold per candidate pair.
    cn = c.select(F.col(id_col), "_v", _norm(F.col("_v")).alias("_nv"))
    cells = _assign(cn, id_col, "_v", 1, payload=("_v", "_nv"))
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("_q"),
    ).select(
        F.col(query_id_col), "_q", _norm(F.col("_q")).alias("_nq")
    )
    qcells = _assign(q, query_id_col, "_q", nprobe, payload=("_q", "_nq"))
    cand = cells.join(F.broadcast(qcells), "cent_id")
    sim = cand.select(
        query_id_col,
        id_col,
        (_dot(F.col("_v"), F.col("_q"))
         / (F.col("_nv") * F.col("_nq"))).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        sim.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def auto_block_bits(corpus_rows: int, pairs_per_row: float = 8.0, min_bits: int = 6) -> int:
    """Blocking-bits dial for :func:`embedding_near_dup`: pick nbits so
    the expected candidate-pair count stays ~linear in the corpus.

    With ~uniform sign bits, 2^nbits buckets of ~n/2^nbits rows give
    ~n²/2^(nbits+1) pairs; solving pairs ≈ pairs_per_row·n gives
    2^nbits ≈ n/(2·pairs_per_row). A FIXED nbits is the scale-killer
    VERDICT r1 flagged: 64 buckets means ~n²/64 pairs — quadratic at
    100×. This dial keeps the pair space O(n) as the corpus grows —
    BUT ONLY on ~uniform sign distributions: the r9 scale curve
    measured this dial at tail exponent ~1.9 on a CLUSTERED corpus
    (vectors share their centroid's sign pattern, so more bits never
    split the giant buckets). For real embedding corpora use
    :func:`ivf_cell_near_dup` (catalog q271) — Voronoi-cell blocking
    holds occupancy n/ncells regardless of clustering."""
    import math

    if corpus_rows <= 1:
        return min_bits
    return max(min_bits, math.ceil(math.log2(max(corpus_rows / (2.0 * pairs_per_row), 2.0))))


def embedding_near_dup(
    corpus: DataFrame,
    nbits: int | None = None,
    threshold: float = 0.85,
    topk: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs by SIGN-BIT blocking —
    the FLAT-CORPUS dial of the q55 family. On clustered corpora (the
    realistic shape) prefer :func:`ivf_cell_near_dup` (catalog q271):
    the r9 scale curve measured this operator's auto-bits dial at tail
    exponent ~1.9 there, vs 0.95 for cell blocking. Sign-block blocked
    self-join + exact cosine re-rank, with the
    ``cosine_sim >= threshold`` predicate applied BELOW any global
    top-k, so the TakeOrdered input is the (tiny) set of true near-dups,
    not every blocked pair.

    Returns (id_a, id_b, cosine_sim) with id_a < id_b.

    - ``nbits=None`` applies :func:`auto_block_bits` (corpus_rows hint or
      one count job) so candidate pairs stay ~linear in corpus size.
    - The blocking key is the sign bitstring of the first nbits
      components — computed in-row, the self-join is an equi-join on the
      block (shuffle keyed on block, never all-pairs).
    - ``topk`` optionally returns only the strongest pairs
      (total-ordered tiebreak) AFTER the threshold filter.

    Recall note: sign-blocking on raw components is exact only for pairs
    agreeing on all nbits signs; near-dups with a sign flip in the first
    nbits dims are missed — raise recall with multiple shifted blocks
    (cf. lsh_ann_topk's ntables) when the miss rate matters."""
    if nbits is None:
        n = corpus_rows if corpus_rows is not None else corpus.count()
        nbits = auto_block_bits(n)
    v = F.col(vec_col).cast("array<double>")
    blk = F.array_join(
        F.transform(
            F.slice(v, 1, nbits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )
    # per-row norm computed ONCE below the self-join (r12): inside the
    # pair projection each side's _norm fold re-ran per PAIR, and the
    # threshold predicate pushed into the join condition re-ran the
    # whole cosine for both orderings of every block-mate (see
    # _pair_score).  Same expression on the same row -> same IEEE bits.
    e = corpus.select(
        F.col(id_col).alias("_id"), v.alias("_v"), blk.alias("_blk")
    ).select("_id", "_v", "_blk", _norm(F.col("_v")).alias("_nr"))
    a = e.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_nr").alias("_nra"), "_blk",
    )
    b = e.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_nr").alias("_nrb"), "_blk",
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        F.col("_nra") * F.col("_nrb")
    )
    scored = pairs.select(
        "id_a", "id_b", F.explode(F.array(cos)).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)
    if topk is not None:
        scored = scored.orderBy(
            F.col("cosine_sim").desc(), F.col("id_a").asc(), F.col("id_b").asc()
        ).limit(topk)
    return scored


def ivf_cell_assignments(
    corpus: DataFrame,
    ncells: int | None = None,
    nassign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """The flat-IVF blocking relation: (id, _v, _qn, _cells, cent_id)
    — each vector with its quantized self-norm, its full sorted
    assigned-cell array (``_cells``, nassign ints — the r11 structural
    pair-dedup payload), and one row per assigned Voronoi cell around
    the md5-sampled centroids.  Extracted from
    :func:`ivf_cell_near_dup` (r10) so the recall censuses (q273/q274)
    audit EXACTLY the assignment the registered near-dup pairs on — a
    re-derivation could drift.  Map-side only: one broadcast
    struct-array row + an in-row quantized argmax; the corpus is never
    exchanged to be assigned."""
    if ncells is None:
        n = corpus_rows if corpus_rows is not None else corpus.count()
        # nassign·sqrt(n): the flat-IVF balanced dial, re-balanced so
        # multi-assignment costs LINEAR in nassign (auto_ncells r11)
        ncells = auto_ncells(n, nassign=nassign)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_qn", quantized_dot(F.col("_v"), F.col("_v")))
    cents = sampled_centroids(c, ncells, id_col, "_v", seed=seed)
    carr = cents.select(
        "cent_id", "_c", quantized_dot(F.col("_c"), F.col("_c")).alias("_qnc")
    ).agg(
        F.array_sort(F.collect_list(F.struct("cent_id", "_c", "_qnc"))).alias(
            "_cents"
        )
    )
    # struct(-score, cent_id): ascending struct order == (score DESC,
    # cent_id ASC) — the same comparator/tiebreak as q56's assignment
    # and the oracle's row_number window
    scored_cells = F.transform(
        F.col("_cents"),
        lambda ct: F.struct(
            (
                -(
                    (quantized_dot(F.col("_v"), ct["_c"]).cast("double")
                     / F.lit(_QSCALE))
                    / F.sqrt(ct["_qnc"].cast("double") / F.lit(_QSCALE))
                )
            ).alias("negscore"),
            ct["cent_id"].alias("cent_id"),
        ),
    )
    top = F.slice(F.array_sort(scored_cells), 1, nassign)
    # _cells: the vector's full (sorted) assigned-cell set, carried
    # beside the exploded join key — map-side, tiny (nassign ints),
    # and what lets ivf_cell_near_dup dedupe multi-cell pairs with an
    # in-row filter instead of a pair-sized exchange (r11).
    #
    # The explode(array(top)) hop is a DELIBERATE Generate barrier:
    # deriving _cells and the per-cell explode from the same `top`
    # expression in one projection makes Catalyst evaluate the whole
    # O(ncells·d) argmax TWICE per row (measured: 45 -> 132 s at the
    # sf1 clone, the argmax re-run costing more than the assignment
    # itself).  A generator's output is a bona fide attribute, so both
    # downstream references read the materialized 2-element array and
    # the argmax runs exactly once.
    materialized = (
        c.crossJoin(F.broadcast(carr))
        .select(
            F.col(id_col), "_v", "_qn",
            F.explode(F.array(top)).alias("_top"),
        )
    )
    return (
        materialized.select(
            F.col(id_col),
            "_v",
            "_qn",
            F.array_sort(
                F.transform("_top", lambda t: t["cent_id"])
            ).alias("_cells"),
            F.explode("_top").alias("_t"),
        )
        .select(
            id_col, "_v", "_qn", "_cells",
            F.col("_t.cent_id").alias("cent_id"),
        )
    )


def _pair_score(pairs: DataFrame, threshold: float) -> DataFrame:
    """(id_a, id_b, cosine_sim >= threshold) from blocked candidate
    pairs carrying (_va, _qna, _vb, _qnb) — the shared scoring tail of
    the near-dup operators.

    The explode(array(cosine)) hop is a DELIBERATE Generate barrier
    (the ivf_cell_assignments argmax rule applied to pair scoring,
    r12): written as select(cos).filter(cos >= t), Catalyst pushes the
    threshold predicate into the blocked JOIN CONDITION, where the
    O(d) quantized dot runs for BOTH orderings of every cell-mate pair
    — the conjunct order puts it BEFORE the id_a < id_b cut — and then
    once more in the surviving projection: ~2.5 dot folds per
    candidate pair.  Behind the generator the dot is a materialized
    attribute: the join condition keeps only the cheap structural
    predicates, and each unordered candidate pair pays exactly ONE
    fold.  Same rows, same values — only where the expression
    evaluates."""
    cos = (
        quantized_dot(F.col("_va"), F.col("_vb")).cast("double")
        / F.lit(_QSCALE)
    ) / (
        F.sqrt(F.col("_qna").cast("double") / F.lit(_QSCALE))
        * F.sqrt(F.col("_qnb").cast("double") / F.lit(_QSCALE))
    )
    return (
        pairs.select(
            "id_a", "id_b", F.explode(F.array(cos)).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_cell_near_dup(
    corpus: DataFrame,
    ncells: int | None = None,
    threshold: float = 0.85,
    topk: int | None = None,
    nassign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs blocked by IVF coarse cells — the scale
    path for CLUSTERED corpora, where sign-bit blocking degenerates.

    The r9 scale curve measured both dials of
    :func:`embedding_near_dup` on a 10-centroid clustered corpus:
    fixed 6-bit sign blocks scale ~quadratically (the bucket count is
    capped), and auto_block_bits makes it WORSE (2.75 -> 175 s over a
    10x corpus, tail exponent ~1.9): clustered vectors share their
    centroid's sign pattern, so adding bits does not split the giant
    buckets — sign-LSH only equalizes ~uniform sign distributions.
    Voronoi cells around sampled centroids split exactly what sign
    bits cannot: expected cell occupancy is n/ncells REGARDLESS of how
    the corpus clusters. The dial obeys the FLAT-IVF LAW (measured in
    the r9 scale curve): assignment is an in-row argmax scan over ALL
    ncells centroids (O(n*ncells*d)) while candidate pairs cost
    O(ncells * (n/ncells)^2) — ncells ~ n/16 makes the ASSIGNMENT the
    quadratic term (319 s at the sf1 clone), and the balanced optimum
    is ncells ~ sqrt(n) (:func:`auto_ncells`), where both terms are
    O(n^1.5). That is the best any flat coarse quantizer can do on a
    self-join; sub-n^1.5 requires a hierarchical quantizer (fixed fan-
    out per level, log depth) — documented as the 100 TB path in
    SCALING.md, not implemented here. Same assignment machinery as
    :func:`ivf_topk` (one broadcast struct-array row + in-row argmax
    fold, map-side only); the self-join shuffles on cent_id (~sqrt(n)
    distinct keys — never a handful of partitions).

    ``nassign > 1`` assigns each vector to its ``nassign`` nearest
    cells (the standard boundary-recall mitigation; pairs sharing two
    cells are deduped by the id-pair key).

    RECALL — MEASURED, r11+r12 (tools/neardup_recall.py, planted
    pairs at cosine 0.95–0.999 on the clustered clones): nassign=1
    blocks only 63.6% of planted pairs (78.5% even at cosine ≥ 0.99 —
    the old "cosine→1 ⇒ co-location→1" claim is FALSE, and it DECAYS
    with n as the √n cells shrink: 76% at 2k rows).  The DEFAULT is
    therefore nassign=2 with ncells re-balanced to 2√n
    (:func:`auto_ncells`): 91.0% of all planted pairs and 98.5% of
    cosine ≥ 0.99 pairs at 21k rows, at 2.1× the candidate cost (the
    linear law — 5.48M vs 2.61M candidates).  r12's sf3 run shows the
    decay persists under multi-assignment too: at 63k rows the default
    drops to 85.7%/97.0% — below deletion grade.  DELETION-GRADE use
    should therefore either escalate to nassign=4 (measured 100% at
    cosine ≥ 0.99 at ALL three scales, 4× cost) or switch to the r12
    re-balanced hierarchical dial (q277 /
    :func:`hierarchical_cell_near_dup` with ``nassign=2``), which
    beats this dial on BOTH recall and cost at every measured scale
    ≥ 21k while staying sub-n^1.5.  The q274 recall census reports
    this dial's recall per corpus; read it before deleting.
    nassign=1 remains available for candidate mining where misses are
    cheap.

    All similarity math — the cell-assignment argmax AND the final
    cosine — runs on floor-quantized integer dots (r10:
    :func:`quantized_dot`), so the operator is bit-identical to its
    DuckDB oracle (catalog entry q271) at every magnitude; the
    per-vector quantized self-norm is computed ONCE at the scan and
    carried through the assignment as payload, never re-joined
    (the q55/q56 vnorm discipline).
    """
    assigned = ivf_cell_assignments(
        corpus,
        ncells=ncells,
        nassign=nassign,
        id_col=id_col,
        vec_col=vec_col,
        corpus_rows=corpus_rows,
        seed=seed,
    )
    # Multi-assignment dedup is STRUCTURAL, not an exchange:
    # dropDuplicates on the joined pairs would shuffle rows carrying
    # both 64-dim vectors (measured 5.6x wall at the sf1 clone — ~5 GB
    # of array payload through the dedup aggregate for a 2.1x candidate
    # count).  Instead each vector rides with its (tiny, sorted) cell
    # ARRAY — produced map-side by the assignment itself — and a pair
    # is emitted ONLY in the minimum cell the two sides share: an
    # in-row array_intersect filter, zero extra exchanges, exactly one
    # row per qualifying pair (== the oracle's DISTINCT).
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_qn").alias("_qna"),
        *(["_cells"] if nassign > 1 else []),
        "cent_id",
    )
    if nassign > 1:
        a = a.withColumnRenamed("_cells", "_cells_a")
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_qn").alias("_qnb"),
        *(["_cells"] if nassign > 1 else []),
        "cent_id",
    )
    if nassign > 1:
        b = b.withColumnRenamed("_cells", "_cells_b")
    pairs = a.join(b, "cent_id").filter(F.col("id_a") < F.col("id_b"))
    if nassign > 1:
        pairs = pairs.filter(
            F.col("cent_id")
            == F.array_min(F.array_intersect("_cells_a", "_cells_b"))
        )
    scored = _pair_score(pairs, threshold)
    if topk is not None:
        scored = scored.orderBy(
            F.col("cosine_sim").desc(), F.col("id_a").asc(),
            F.col("id_b").asc(),
        ).limit(topk)
    return scored


def auto_fanout(
    corpus_rows: int,
    floor: int = 4,
    leaf_topk: int = 1,
    nassign: int = 1,
) -> int:
    """Cube-root fan-out dial for the two-level quantizer: with f
    cells per level, TWO assignment passes cost O(n·f·d) each, leaves
    number f², occupancy is n/f², and within-leaf pairs cost
    O(f²·(n/f²)²) = O(n²/f²).  f = n^(1/3) balances assignment and
    pair work at O(n^(4/3)·d) — strictly below the flat quantizer's
    measured-optimal O(n^(3/2)) (the r9 flat-IVF law).  Floor keeps
    tiny corpora from degenerate 1-cell levels.

    ``nassign`` re-balances for cross-product multi-assignment (r12 —
    the deletion-grade dial): top-a cells at both levels give every
    vector a² leaf memberships, so at FIXED leaves L = f² the
    candidate pairs M²/2L blow up a⁴ (the measured 12× of r11's hier
    nassign=2).  Scaling the per-level fan-out to f = a·⌊n^(1/3)⌋
    makes L = a²·n^(2/3), restoring the law to a²·n^(4/3)/2 — still
    strictly sub-n^1.5 with a fixed.  MEASURED on the planted-pair
    fixture (NEARDUP_RECALL_r12, 21k clustered clone): a=2 blocks
    99.7% of planted pairs at cosine ≥ 0.99 (91.6% overall) at 3.16M
    candidate pairs — ABOVE the flat production dial's 98.5% recall
    and BELOW its 5.48M cost, making this the deletion-grade
    sub-n^1.5 dial (q277).

    ``leaf_topk`` re-balances for the global-leaf top-k mode (same
    isqrt algebra: memberships M = n·k, leaves scaled to k·n^(2/3) via
    f = √(k·f₀²) keep the law k·n^(4/3)/2, linear in k).  MEASURED
    NEGATIVE (r12): the top-k dials lose recall faster than they save
    cost at scale (89–93% at cosine ≥ 0.99 at 21k rows vs the
    cross-product re-balance's 99.7% at comparable candidates) — the
    mode is kept as the tool-exercised negative control, not a
    production path.

    EXACT integer arithmetic throughout (largest f with f³ ≤ n, then
    ``a·f`` / ``isqrt(k·f²)``), not a float round: libm pow is not correctly
    rounded, so a float cube root could disagree by 1 ulp with the
    SQL oracle's computation of the same dial — integer arithmetic is
    the only form both engines reproduce bit-identically at every
    corpus size (the q272/q277 contract; same reason the √n dial uses
    IEEE sqrt, which IS correctly rounded)."""
    import math

    n = max(corpus_rows, 1)
    f = round(n ** (1.0 / 3.0)) or 1
    while f**3 > n:
        f -= 1
    while (f + 1) ** 3 <= n:
        f += 1
    if nassign > 1:
        f = nassign * f
    if leaf_topk > 1:
        f = math.isqrt(leaf_topk * f * f)
    return max(floor, f)


# Largest corpus (rows) at which each ``nassign`` of the re-balanced
# hierarchical dial is MEASURED at deletion grade (>= 98.5% blocking
# recall on planted pairs at cosine >= 0.99) — NEARDUP_RECALL_r12,
# clustered clones 2k/21k/63k/210k rows:
#   a=2: 100% @ 2k, 99.7% @ 21k, 98.5% @ 63k, 97.8% @ 210k
#        -> at grade through 63k (decay ~0.6-1.2 pp per 3.3x rows)
#   a=3: 100% @ 21k, 99.9% @ 63k, 99.88% @ 210k
#        -> at grade through 210k with ~0.1 pp per 3.3x slope; the
#        10x allowance below spends ~1.3 pp of its ~1.4 pp headroom
_NASSIGN_GRADE_CEILING: list[tuple[int, int]] = [
    (2, 63_010),
    (3, 2_098_090),  # 10x the largest measured point, slope-justified
]


def auto_nassign(corpus_rows: int, floor: int = 2) -> int:
    """Smallest ``nassign`` measured (or slope-extrapolated) to hold
    DELETION GRADE — >= 98.5% blocking recall at cosine >= 0.99 — for
    the re-balanced hierarchical dial (q277) at this corpus size.

    Every fixed dial's recall decays with corpus size (~0.6–1.2 pp per
    3.3× rows for a=2, ~0.1 pp for a=3 — measured, see
    ``_NASSIGN_GRADE_CEILING``), so a 100 TB deletion pipeline cannot
    freeze ``nassign``: this helper steps it with n. Within the
    measured grid the step points are measurements; past 2.1M rows
    (10× the largest measured corpus) it escalates +1 per additional
    decade and emits a ``UserWarning`` — that region is EXTRAPOLATION,
    and the honest protocol there is to run the q278 recall/cost
    census on the actual corpus before deleting anything.

    Cost stays sub-n^1.5 along the whole schedule: candidates follow
    a²·n^(4/3)/2 (:func:`auto_fanout`), and a grows like log n."""
    import warnings

    n = max(corpus_rows, 1)
    for a, ceiling in _NASSIGN_GRADE_CEILING:
        if n <= ceiling:
            return max(floor, a)
    last_a, last_ceiling = _NASSIGN_GRADE_CEILING[-1]
    # exact integer decade count (float log10 is off by an ulp at
    # exact powers of ten — same discipline as auto_fanout's icbrt)
    decades, bound = 0, last_ceiling
    while n > bound:
        decades += 1
        bound *= 10
    warnings.warn(
        f"auto_nassign: corpus_rows={n} is past the measured recall "
        f"grid (<= {last_ceiling}); escalating to nassign="
        f"{last_a + decades} by +1/decade EXTRAPOLATION — run the "
        "q278 blocking census on this corpus before deletion-grade use",
        UserWarning,
        stacklevel=2,
    )
    return max(floor, last_a + decades)


def hierarchical_cell_assignments(
    corpus: DataFrame,
    fanout: int | None = None,
    nassign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
    seed: int = 42,
    leaf_topk: int | None = None,
) -> DataFrame:
    """The two-level blocking relation: (id, _v, _qn, cell1, cell2) —
    each vector with its quantized self-norm and its (top-``nassign``
    per level) leaf.  Extracted from :func:`hierarchical_cell_near_dup`
    (r10) so the recall census (q273) audits EXACTLY the assignment
    the registered near-dup pairs on.  Level 1 is the flat machinery
    verbatim (broadcast struct-array + in-row quantized argmax,
    map-side); level 2 draws md5-ranked sub-centroids within each cell
    (WindowGroupLimit prunes the rank filter map-side) and argmaxes
    over the per-cell array joined back on the L1 key.

    ``leaf_topk=k`` (r12 — the deletion-grade sub-n^1.5 mode): instead
    of the per-level cross product (``nassign²`` leaf memberships —
    the measured 12× cost blow-up of r11's hier nassign=2), ``nassign``
    acts as the LEVEL-1 BEAM ONLY: every sub-cell of the vector's
    ``nassign`` nearest L1 cells is scored, and the k best
    (cell1, cell2) LEAVES overall are kept — memberships are n·k, and
    with :func:`auto_fanout`'s ``leaf_topk`` re-balance the candidate
    pairs stay k·n^(4/3)/2, linear in k.  Output rows gain ``leaf_id``
    (= cell1·fanout + cell2, the single bigint join key) and
    ``_leaves`` (the vector's sorted leaf_id array — the structural
    pair-dedup payload, same trick as the flat dial's ``_cells``).
    The beam choice is adaptive per vector: a vector near an L1
    boundary spends its k memberships across L1 cells, one near an L2
    boundary spends them within — no level needs its own dial.

    ASSIGNMENT-COVERAGE CONTRACT (both modes): the level-2 join on
    ``cell1`` is INNER — an L1 cell whose members are ALL
    draw-ineligible (quantized self-norm ≤ 0, i.e. degenerate
    vectors) yields no sub-centroids and its members are absent from
    the output relation entirely.  Such vectors have no meaningful
    cosine to anything (the pair stage would score them NaN/0 and the
    threshold drops them), and the SQL oracles mirror the same inner
    join — but raw-operator callers on unfiltered corpora should know
    the relation is not total over degenerate-only cells."""
    if fanout is None:
        n = corpus_rows if corpus_rows is not None else corpus.count()
        # multi-assignment / leaf_topk re-balance the fan-out so the
        # candidate-pair law stays sub-n^1.5 (auto_fanout r12)
        fanout = auto_fanout(
            n, nassign=1 if leaf_topk else nassign, leaf_topk=leaf_topk or 1
        )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_qn", quantized_dot(F.col("_v"), F.col("_v")))

    def _argmax_cells(df, cents_arr_col, keep_n, out_col):
        scored_cells = F.transform(
            F.col(cents_arr_col),
            lambda ct: F.struct(
                (
                    -(
                        (quantized_dot(F.col("_v"), ct["_c"]).cast("double")
                         / F.lit(_QSCALE))
                        / F.sqrt(ct["_qnc"].cast("double") / F.lit(_QSCALE))
                    )
                ).alias("negscore"),
                ct["cent_id"].alias("cent_id"),
            ),
        )
        top = F.slice(F.array_sort(scored_cells), 1, keep_n)
        keep = [f for f in df.columns if f != cents_arr_col]
        return (
            df.select(*keep, F.explode(top).alias("_t"))
            .select(*keep, F.col("_t.cent_id").alias(out_col))
        )

    # ---- level 1: the flat machinery verbatim -------------------------
    cents1 = sampled_centroids(c, fanout, id_col, "_v", seed=seed)
    carr1 = cents1.select(
        "cent_id", "_c", quantized_dot(F.col("_c"), F.col("_c")).alias("_qnc")
    ).agg(
        F.array_sort(F.collect_list(F.struct("cent_id", "_c", "_qnc"))).alias(
            "_c1"
        )
    )
    l1_pass = _argmax_cells(
        c.crossJoin(F.broadcast(carr1)), "_c1", nassign, "cell1"
    )
    # r12 measured the L1 argmax pipeline running ONCE PER CONSUMER
    # (the sub-centroid window and the level-2 join each plant their
    # own cell1 exchange; filter + partial-WindowGroupLimit pushdown
    # crosses RepartitionByExpression so the subtrees never
    # canonicalize equal and ReusedExchange can't fire — verified in
    # the q277/q278 runtime final plans).  A cell1-partitioned
    # localCheckpoint of the PAYLOAD-CARRYING l1 removed the duplicate
    # pass but inverted at sf0.3+ (q272 4.75→9.63 s: materializing +
    # re-reading 64-dim vectors through the block manager grows with
    # bytes while the deduped argmax doesn't) and was reverted.
    #
    # r13: checkpoint only the NARROW (id, _qn, cell1) assignment —
    # ints and a bigint, never the vector — so the argmax folds run
    # exactly once per execution, then re-attach the payload by id:
    # * the sub-centroid draw ranks on narrow columns alone; only the
    #   ≤ fanout² SURVIVORS (a²·n^(2/3) rows) fetch their vector back,
    #   via an explicit broadcast join against the corpus scan —
    #   map-side, no corpus exchange, broadcast stays ~64 MB even at
    #   n = 10⁹.
    # * the level-2 probe side re-joins (id, cell1) onto the corpus
    #   scan; AQE picks the strategy from the checkpoint's exact size
    #   (broadcast at bench scale, id-shuffle of scan-fresh rows at
    #   cluster scale — shuffle files are fault-tolerant where a
    #   payload checkpoint block is not, the r12 ADVICE point).
    # Unique non-null id_col is the similarity family's documented
    # ingest precondition (tools/hostile_sweep.contract_exempt), so
    # the id-keyed re-join is exact: one corpus row per narrow id.
    narrow = l1_pass.select(id_col, "_qn", "cell1").localCheckpoint(
        eager=True
    )
    l1 = c.join(narrow.select(id_col, "cell1"), id_col)

    # ---- level 2: per-cell sub-centroid draw + in-row argmax ----------
    # Draw eligibility mirrors sampled_centroids (r11): zero-norm /
    # NULL-dot vectors never become sub-centroids (they'd score NaN /
    # NULL for every cell member — the cross-engine divergence class).
    # NOTE the inner join below: members of a cell with NO eligible
    # sub-centroids (every member degenerate) get no leaf at all — the
    # docstring's assignment-coverage contract, mirrored by the
    # oracles' v2 join (ADVICE r11).
    h2 = F.md5(F.concat(F.lit(f"{seed}b:"), F.col(id_col).cast("string")))
    w2 = Window.partitionBy("cell1").orderBy("_h2", id_col)
    picked = (
        narrow.filter(F.col("_qn") > 0)
        .withColumn("_h2", h2)
        .withColumn("_srn", F.row_number().over(w2))
        .filter(F.col("_srn") <= fanout)
        .select(id_col, "cell1", "_srn")
    )
    subs = (
        c.join(F.broadcast(picked), id_col)
        .select(
            "cell1",
            F.struct(
                (F.col("_srn") - 1).alias("cent_id"),
                F.col("_v").alias("_c"),
                F.col("_qn").alias("_qnc"),
            ).alias("_s"),
        )
        .groupBy("cell1")
        .agg(F.array_sort(F.collect_list("_s")).alias("_c2"))
    )
    joined = l1.join(subs, "cell1")
    if leaf_topk is None:
        return _argmax_cells(joined, "_c2", nassign, "cell2")

    # ---- beamed global-leaf top-k (r12) --------------------------------
    # Score every sub-cell of every beam cell as a (negscore, cell1,
    # cell2) struct; ascending struct order == (score DESC, cell1 ASC,
    # cell2 ASC) — the oracle's row_number comparator.  The per-beam-
    # cell slice to k is a lossless pre-filter for the global top-k
    # (at most k survivors can come from any one cell1), so the
    # groupBy shuffles nassign·k tiny structs per vector, never
    # nassign·fanout.
    scored_leaves = F.transform(
        F.col("_c2"),
        lambda ct: F.struct(
            (
                -(
                    (quantized_dot(F.col("_v"), ct["_c"]).cast("double")
                     / F.lit(_QSCALE))
                    / F.sqrt(ct["_qnc"].cast("double") / F.lit(_QSCALE))
                )
            ).alias("negscore"),
            F.col("cell1").alias("cell1"),
            ct["cent_id"].alias("cell2"),
        ),
    )
    per_cell = joined.select(
        id_col, "_v", "_qn",
        F.slice(F.array_sort(scored_leaves), 1, leaf_topk).alias("_lv"),
    )
    grouped = per_cell.groupBy(id_col).agg(
        F.first("_v").alias("_v"),
        F.first("_qn").alias("_qn"),
        F.flatten(F.collect_list("_lv")).alias("_all"),
    )
    top = F.slice(F.array_sort("_all"), 1, leaf_topk)
    fan = F.lit(fanout).cast("bigint")
    # explode(array(top)): the flat dial's Generate barrier (r11
    # CollapseProject rule) — _leaves and the per-leaf explode both
    # read the materialized top-k array, so the sort/slice runs once
    materialized = grouped.select(
        id_col, "_v", "_qn", F.explode(F.array(top)).alias("_top"),
    )
    return (
        materialized.select(
            id_col, "_v", "_qn",
            F.array_sort(
                F.transform(
                    "_top",
                    lambda t: t["cell1"].cast("bigint") * fan + t["cell2"],
                )
            ).alias("_leaves"),
            F.explode("_top").alias("_t"),
        )
        .select(
            id_col, "_v", "_qn", "_leaves",
            F.col("_t.cell1").alias("cell1"),
            F.col("_t.cell2").alias("cell2"),
            (F.col("_t.cell1").cast("bigint") * fan
             + F.col("_t.cell2")).alias("leaf_id"),
        )
    )


def hierarchical_cell_near_dup(
    corpus: DataFrame,
    fanout: int | None = None,
    threshold: float = 0.85,
    topk: int | None = None,
    nassign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
    seed: int = 42,
    leaf_topk: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs blocked by a TWO-LEVEL hierarchical
    coarse quantizer — the named sub-n^1.5 path beyond flat IVF
    (:func:`ivf_cell_near_dup`), built exactly as SCALING.md specified:
    fixed fan-out per level, log depth (2 levels here — the first
    rung of the ladder; each further level multiplies cells by f and
    divides the pair exponent's distance to linear).

    Level 1 is the flat machinery verbatim: ``fanout`` md5-sampled
    centroids broadcast as one struct-array row, in-row quantized
    argmax, map-side only.  Level 2 then REFINES within each L1 cell:
    the ``fanout`` members of the cell ranking smallest under
    md5(seed||'b:'||id) become the cell's sub-centroids (one window
    per cell — WindowGroupLimit prunes the rank filter map-side, so
    the sort never materializes more than f rows per cell), the
    per-cell sub-centroid array joins back on the L1 key, and a second
    in-row argmax assigns the leaf.  Pairs join on the composite
    (cell, subcell) key — f² distinct keys, expected occupancy n/f².

    Cost law (:func:`auto_fanout`): f = n^(1/3) makes both assignment
    passes and the within-leaf pair work O(n^(4/3)·d) — below the flat
    path's O(n^(3/2)).  The constant is higher (a corpus exchange on
    the L1 key for the level-2 window + sub-centroid join, where flat
    IVF's assignment is exchange-free), so flat wins until the
    occupancy term dominates — the crossover is measured in the r10
    scale curve rather than asserted.

    All scoring is floor-quantized integer dots (engine-exact, same
    contract as the flat operator).  ``nassign > 1`` takes the top-n
    cells at BOTH levels (boundary-recall mitigation squared; pairs
    dedup on the id-pair key).  Determinism: both centroid draws are
    md5-seeded rank picks — no RNG state anywhere.

    RECALL/COST — MEASURED, r11+r12 (tools/neardup_recall.py, planted
    pairs at cosine 0.95–0.999 on the 21k clustered clone): at
    nassign=1 the two-level leaves block only 52.8% of planted pairs
    (71.3% at cosine ≥ 0.99) — the f² small leaves trade recall for
    their sub-n^1.5 cost; it remains the candidate-mining /
    clustering dial where misses are cheap.  nassign=2 at the r11
    FIXED fan-out recovered 94.8%/99.4% but at nassign² leaf
    memberships = 12× the candidate pairs (11.4M vs 0.93M).  r12
    re-balanced the fan-out to f = a·∛n (:func:`auto_fanout`), which
    restores the law to a²·n^(4/3)/2: MEASURED 91.6% overall / 99.7%
    at cosine ≥ 0.99 at 3.16M candidates — above the flat production
    dial's recall (98.5%) and below its cost (5.48M), while staying
    sub-n^1.5.  nassign=2 with fanout=None (the auto re-balance) is
    therefore the DELETION-GRADE dial, registered as q277; its pair
    dedup is structural (min shared leaf_id — never a dropDuplicates
    over vector payloads).  ``leaf_topk`` (global top-k leaves,
    memberships n·k) measured WORSE at scale (89–93% at ≥ 0.99) and
    stays a tool-exercised negative control.

    RECALL-vs-n (r12 extension, 210k-row clone): nassign=2 decays
    ~0.6–1.2 pp per 3.3× rows at cosine ≥ 0.99 (99.7% → 98.5% →
    97.8% over 21k/63k/210k) and crosses below deletion grade past
    ~63k rows; nassign=3 (same a² law, measured 100%/99.9%/99.88% at
    the three scales) holds grade with a ~0.1 pp slope.  Size
    ``nassign`` with :func:`auto_nassign` — the measured escalation
    schedule (a grows like log n, so cost stays sub-n^1.5) — and past
    its measured grid run the q278 census on the real corpus first.
    """
    if fanout is None and nassign > 1 and leaf_topk is None:
        # resolve the re-balanced fan-out HERE so the leaf_id encoding
        # below (cell1·fanout + cell2) knows the modulus
        n = corpus_rows if corpus_rows is not None else corpus.count()
        fanout = auto_fanout(n, nassign=nassign)
        corpus_rows = n
    l2 = hierarchical_cell_assignments(
        corpus,
        fanout=fanout,
        nassign=nassign,
        id_col=id_col,
        vec_col=vec_col,
        corpus_rows=corpus_rows,
        seed=seed,
        leaf_topk=leaf_topk,
    )

    # r13, both pair branches below: the self-join's two sides are the
    # SAME relation, so key it on the join key through ONE exchange
    # with a PINNED partition count before aliasing the sides —
    # (1) both sides read a single shuffle output (ReusedExchange: the
    # whole assignment pipeline runs once per execution, not once per
    # side — verified in the runtime final plan), and (2) the pin opts
    # the exchange out of AQE's byte-based coalescing, which at bench
    # scale folded the quadratic-per-leaf pair stage to 4 tasks (the
    # q48 rule: per-bucket join work is invisible to byte-sized
    # coalescing; at 100 TB the bytes exceed the advisory size and AQE
    # would not coalesce anyway, so the pin only bites where it
    # should).  Leaf keys number ~a²·n^(2/3) — never a handful.
    _nparts = corpus.sparkSession.sparkContext.defaultParallelism

    if leaf_topk is not None:
        # Structural multi-membership dedup (the flat dial's r11 rule:
        # never dropDuplicates over rows carrying vector payloads) — a
        # pair is emitted ONLY in the minimum leaf the two sides
        # share, an in-row array_intersect filter on the tiny sorted
        # leaf_id arrays the assignment produced map-side.
        l2 = l2.repartition(_nparts, "leaf_id")
        a = l2.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_qn").alias("_qna"),
            F.col("_leaves").alias("_leaves_a"),
            "leaf_id",
        )
        b = l2.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_qn").alias("_qnb"),
            F.col("_leaves").alias("_leaves_b"),
            "leaf_id",
        )
        pairs = a.join(b, "leaf_id").filter(F.col("id_a") < F.col("id_b"))
        if leaf_topk > 1:
            pairs = pairs.filter(
                F.col("leaf_id")
                == F.array_min(F.array_intersect("_leaves_a", "_leaves_b"))
            )
    elif nassign > 1:
        # Cross-product multi-assignment (the r12 deletion-grade dial
        # at nassign=2 with auto_fanout's re-balanced f = a·∛n): dedup
        # is STRUCTURAL, same rule as flat/leaf_topk — dropDuplicates
        # over pair rows carrying two 64-dim vectors was the measured
        # 5.6× anti-pattern.  The a² leaves per vector live on a
        # L1-membership rows, so ONE corpus-sized groupBy assembles
        # each vector's sorted leaf_id array (tiny: a² bigints), then
        # pairs join on leaf_id and keep only the minimum shared leaf.
        fan = F.lit(fanout).cast("bigint")
        leaf = F.col("cell1").cast("bigint") * fan + F.col("cell2")
        assembled = (
            l2.withColumn("leaf_id", leaf)
            .groupBy(id_col)
            .agg(
                F.first("_v").alias("_v"),
                F.first("_qn").alias("_qn"),
                F.array_sort(F.collect_set("leaf_id")).alias("_leaves"),
            )
            .select(
                id_col, "_v", "_qn", "_leaves",
                F.explode("_leaves").alias("leaf_id"),
            )
            .repartition(_nparts, "leaf_id")
        )
        a = assembled.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_qn").alias("_qna"),
            F.col("_leaves").alias("_leaves_a"),
            "leaf_id",
        )
        b = assembled.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_qn").alias("_qnb"),
            F.col("_leaves").alias("_leaves_b"),
            "leaf_id",
        )
        pairs = (
            a.join(b, "leaf_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                F.col("leaf_id")
                == F.array_min(F.array_intersect("_leaves_a", "_leaves_b"))
            )
        )
    else:
        l2 = l2.repartition(_nparts, "cell1", "cell2")
        a = l2.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_qn").alias("_qna"),
            "cell1",
            "cell2",
        )
        b = l2.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_qn").alias("_qnb"),
            "cell1",
            "cell2",
        )
        pairs = a.join(b, ["cell1", "cell2"]).filter(
            F.col("id_a") < F.col("id_b")
        )
    scored = _pair_score(pairs, threshold)
    if topk is not None:
        scored = scored.orderBy(
            F.col("cosine_sim").desc(), F.col("id_a").asc(),
            F.col("id_b").asc(),
        ).limit(topk)
    return scored


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    ntables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share a (table, bucket) with
    the query in ≥1 of the ntables sign-LSH tables; exact cosine scores
    only the candidates. Returns (query_id, vec_id, cosine_sim, rn).

    Pass ``dim`` (the embedding dimensionality — fixed per corpus by
    contract) to keep index build fully lazy; if omitted, ONE driver
    probe of the first corpus row sizes the hyperplanes (a job per
    index build — fine interactively, avoid in pipelines)."""
    if dim is None:
        probe = corpus.select(vec_col).first()
        if probe is None:
            raise ValueError(
                "lsh_ann_topk: empty corpus — pass dim= or a non-empty corpus"
            )
        dim = len(probe[0])
    planes = hyperplanes(dim, nbits, ntables, seed)
    cb = random_hyperplane_buckets(
        corpus.select(id_col, vec_col), planes, vec_col
    ).select(id_col, "table_id", "bucket",
             F.col(vec_col).cast("array<double>").alias("_v"))
    qb = random_hyperplane_buckets(
        queries.select(query_id_col, query_vec_col), planes, query_vec_col
    ).select(query_id_col, "table_id", "bucket",
             F.col(query_vec_col).cast("array<double>").alias("_q"))
    cand = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .select(query_id_col, id_col, "_v", "_q")
        .dropDuplicates([query_id_col, id_col])
    )
    sim = cand.select(
        query_id_col,
        id_col,
        (_dot(F.col("_v"), F.col("_q"))
         / (_norm(F.col("_v")) * _norm(F.col("_q")))).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        sim.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
