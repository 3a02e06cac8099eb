"""Dataset-assembly queries: deterministic splits and sequence packing
(SURVEY §2j [EXT], driver north star "operations a large-scale
training-data pipeline would need").

Both are the shapes an LLM pretraining data pipeline runs on every
corpus snapshot:

- q39: hash-based train/val/test assignment — content-addressed
  (md5 of the id), so the split is stable under reshuffles, re-ingests
  and corpus growth (a doc never migrates between splits), and needs
  no global sort or random state. The classic anti-pattern it replaces
  is ``rand() < 0.8``, which reassigns docs every run.
- q66: greedy contiguous sequence packing — concatenate docs in a
  deterministic order and chunk into fixed token-budget context
  windows; the output maps every doc to its window (bin) and offset.
  This is the concat-and-chunk packing used in GPT-style pretraining;
  a window cumulative sum, so it parallelizes as one window spec
  (running totals), not a sequential loop.

Determinism: md5 hex compares/parses identically in Spark and DuckDB
(verified in q56/q19); token counts and cumulative sums are exact
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import (
    DEC,
    at_rank,
    int_hist,
    literal_df,
    sql_at_rank,
    sql_int_hist,
    t,
)
from .catalog import register

_TRAIN, _VAL = 0.8, 0.1  # remaining 0.1 = test
# 32-hex md5 prefix → uniform in [0, 2^32)
_BUCKETS = 2**32
_TRAIN_CUT = int(_TRAIN * _BUCKETS)
_VAL_CUT = int((_TRAIN + _VAL) * _BUCKETS)


@register(
    "q39_train_test_split",
    tags=("llm-data", "sampling", "split"),
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           AS bucket
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < {_TRAIN_CUT} THEN 'train'
            WHEN bucket < {_VAL_CUT} THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
)
def q39_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed train/val/test split: bucket =
    first 32 bits of md5('split:' || doc_id), thresholds at 80/10/10.
    Stable under reshuffles and corpus growth (no rand(), no global
    sort, no state); map-side only — the one-expression scan shape that
    splits 100 TB without a shuffle."""
    d = t(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < _TRAIN_CUT, "train")
        .when(bucket < _VAL_CUT, "val")
        .otherwise("test")
        .alias("split"),
    )


_CTX_BUDGET = 512  # tokens per packed context window


@register(
    "q66_sequence_packing",
    tags=("llm-data", "sampling", "packing", "window"),
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, md5(coalesce(text, '')) AS tkey,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tok
  FROM documents
),
run AS (
  -- NULLS FIRST + content tie-break pinned: Spark windows order NULL
  -- ids first where DuckDB orders them last, and duplicate ids with
  -- different texts tie on doc_id alone, making the running total
  -- order-dependent (dup/NULL-id fixture)
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ASC NULLS FIRST, tkey ASC
                          ROWS UNBOUNDED PRECEDING) AS run_total
  FROM toks
)
SELECT doc_id, n_tok,
       CAST((run_total - n_tok) // {_CTX_BUDGET} AS BIGINT) AS bin_id,
       CAST((run_total - n_tok) % {_CTX_BUDGET} AS BIGINT) AS bin_offset
FROM run
""",
)
def q66_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: docs concatenated in doc_id
    order, chunked into {_CTX_BUDGET}-token context windows; each doc
    maps to the window where it STARTS (bin_id) and its token offset
    there (long docs simply span windows — exactly how GPT-style
    pretraining packs).

    Shape: whitespace token count in-row, then ONE running-sum window.
    The global ordering makes this a single-partition window at this
    scale; at 100 TB you pack per shard (partitionBy(shard_id) in the
    window spec) — same plan, embarrassingly parallel, and shard-local
    ordering is exactly what packing needs (any stable order works)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("tkey"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast(
            "bigint"
        ).alias("n_tok"),
    )
    # NULLS FIRST + content tie-break: see oracle comment
    w = Window.orderBy(
        F.col("doc_id").asc_nulls_first(), F.col("tkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    run = toks.withColumn("run_total", F.sum("n_tok").over(w))
    start = F.col("run_total") - F.col("n_tok")
    return run.select(
        "doc_id",
        "n_tok",
        F.floor(start / _CTX_BUDGET).cast("bigint").alias("bin_id"),
        (start % _CTX_BUDGET).cast("bigint").alias("bin_offset"),
    )


@register(
    "q67_term_stats",
    tags=("llm-data", "text", "tfidf", "agg"),
    oracle=rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       CAST(MAX(tf) AS BIGINT) AS max_tf,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM tf
GROUP BY term
""",
)
def q67_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics — the df/cf table behind tf-idf weighting,
    stop-listing and the q48 docstring's df-cap: per term, document
    frequency, collection frequency, max in-doc tf, first containing
    doc. Two partial-aggregable hash aggs (explode → (doc,term) → term);
    the shuffle carries term rows, not token occurrences. Integer-exact
    (tf-idf's float idf = ln(N/df) is left to the caller so the gate
    stays bit-exact)."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.max("tf").cast("bigint").alias("max_tf"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_URL = "https?://[^ ]+"
_PII_NUM = "[0-9]+"


@register(
    "q68_pii_scrub",
    tags=("llm-data", "text", "pii", "scrub"),
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{_PII_EMAIL}')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all(lower(text), '{_PII_URL}')) AS INT)
         AS n_urls,
       CAST(len(regexp_extract_all(lower(text), '{_PII_NUM}')) AS INT)
         AS n_numbers,
       md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_URL}', '<URL>', 'g'),
             '{_PII_NUM}', '<NUM>', 'g')) AS scrubbed_hash,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(lower(text),
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_URL}', '<URL>', 'g'),
             '{_PII_NUM}', '<NUM>', 'g')) AS INT) AS scrubbed_len
FROM documents
""",
)
def q68_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / pattern scrubbing — the redaction pass every training
    corpus gets: count emails / URLs / digit runs, then rewrite them to
    typed placeholders (email → URL → number order, so a URL's digits
    don't double-redact). All in-row regexp expressions (map-side only,
    the 100 TB shape); the scrubbed text is emitted as md5 + length so
    the gate hashes the FULL rewritten string without shipping it.
    Patterns use the regex subset where Java and RE2 agree (character
    classes, bounded repeats — no lookaround, per q37's rationale)."""
    d = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(low, _PII_EMAIL, "<EMAIL>"),
            _PII_URL, "<URL>",
        ),
        _PII_NUM, "<NUM>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(_PII_EMAIL), F.lit(0))).cast(
            "int"
        ).alias("n_emails"),
        F.size(F.regexp_extract_all(low, F.lit(_PII_URL), F.lit(0))).cast(
            "int"
        ).alias("n_urls"),
        F.size(F.regexp_extract_all(low, F.lit(_PII_NUM), F.lit(0))).cast(
            "int"
        ).alias("n_numbers"),
        F.md5(F.encode(scrubbed, "utf-8")).alias("scrubbed_hash"),
        F.length(scrubbed).cast("int").alias("scrubbed_len"),
    )


_STRATUM_K = 10


@register(
    "q69_stratified_sample",
    tags=("llm-data", "sampling", "stratified", "window"),
    oracle=f"""
SELECT doc_id, lang, CAST(rn AS INT) AS rn
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('samp:' ||
                        COALESCE(CAST(doc_id AS VARCHAR), '<null>')),
                    doc_id ASC NULLS FIRST) AS rn
  FROM documents
)
WHERE rn <= {_STRATUM_K}
""",
)
def q69_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: the {_STRATUM_K} docs ranking
    smallest under md5('samp:'||doc_id) per language stratum — a seeded
    uniform draw that is reproducible across runs/engines AND stable
    under corpus reshuffles (same property as q39's split; rand()-based
    sampling has neither). One window per stratum; at 100 TB the
    partitionBy(lang) window is embarrassingly parallel across strata,
    and a heavy-stratum top-k can swap in the groupBy + min_by(k)
    partial-aggregate form without changing semantics."""
    d = t(spark, sf_dir, "documents")
    # coalesced hash input + pinned NULL tiebreak: an un-coalesced
    # md5(NULL) sorts NULLS FIRST in Spark windows and NULLS LAST in
    # DuckDB, shifting every rank below it (dup/NULL-id fixture);
    # remaining ties are only between output-identical rows
    h = F.md5(
        F.concat(
            F.lit("samp:"),
            F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>")),
        )
    )
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id").asc_nulls_first())
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _STRATUM_K)
        .select("doc_id", "lang", F.col("rn").cast("int"))
    )


_CHUNK_TOK = 64  # tokens per chunk
_CHUNK_OVERLAP = 16  # tokens shared between adjacent chunks


@register(
    "q83_document_chunking",
    tags=("llm-data", "text", "chunking"),
    oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tok
  FROM documents
),
sized AS (
  SELECT doc_id, tok, len(tok) AS n_tok,
         CAST(greatest(
           ceil((len(tok) - {_CHUNK_OVERLAP})
                / ({_CHUNK_TOK} - {_CHUNK_OVERLAP})::DOUBLE), 1) AS BIGINT)
           AS n_chunks
  FROM toks
)
SELECT doc_id,
       CAST(c.i AS INT) AS chunk_idx,
       CAST(c.i * ({_CHUNK_TOK} - {_CHUNK_OVERLAP}) + 1 AS INT) AS tok_start,
       CAST(least(c.i * ({_CHUNK_TOK} - {_CHUNK_OVERLAP}) + {_CHUNK_TOK},
                  n_tok) AS INT) AS tok_end,
       md5(array_to_string(
             list_slice(tok,
                        (c.i * ({_CHUNK_TOK} - {_CHUNK_OVERLAP}) + 1)::INT,
                        least(c.i * ({_CHUNK_TOK} - {_CHUNK_OVERLAP})
                              + {_CHUNK_TOK}, n_tok)::INT),
             ' ')) AS chunk_hash
FROM sized, unnest(range(0, n_chunks)) c(i)
""",
)
def q83_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — long docs split into
    {_CHUNK_TOK}-token chunks with {_CHUNK_OVERLAP}-token overlap (the
    RAG/embedding-ingest shape): one output row per chunk with its
    token span and the md5 of the re-joined chunk text (the gate hashes
    the full chunk content without shipping it).

    Shape: tokenization staged once per row, chunk fan-out is one
    in-row sequence + explode (no join, no shuffle) — the 100 TB form
    of a chunker. Chunk count = ceil((n - overlap) / stride), min 1, so
    short docs emit exactly one whole-doc chunk."""
    stride = _CHUNK_TOK - _CHUNK_OVERLAP
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("tok"),
    ).select(
        "doc_id", "tok", F.size("tok").alias("n_tok"),
        F.greatest(
            F.ceil((F.size("tok") - F.lit(_CHUNK_OVERLAP))
                   / F.lit(float(stride))),
            F.lit(1),
        ).cast("bigint").alias("n_chunks"),
    )
    fan = toks.select(
        "doc_id", "tok", "n_tok",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("i"),
    )
    tok_start = (F.col("i") * stride + 1).cast("int")
    tok_end = F.least(
        F.col("i") * stride + _CHUNK_TOK, F.col("n_tok").cast("long")
    ).cast("int")
    staged = fan.select(
        "doc_id", "tok",
        F.col("i").cast("int").alias("chunk_idx"),
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
    )
    chunk_text = F.array_join(
        F.slice(
            F.col("tok"),
            F.col("tok_start"),
            F.col("tok_end") - F.col("tok_start") + 1,
        ),
        " ",
    )
    return staged.select(
        "doc_id", "chunk_idx", "tok_start", "tok_end",
        F.md5(F.encode(chunk_text, "utf-8")).alias("chunk_hash"),
    )


_CAP_PER_CELL = 25  # max docs kept per (lang, source) cell


@register(
    "q98_per_source_caps",
    tags=("llm-data", "sampling", "data-mixing", "window"),
    oracle=f"""
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= {_CAP_PER_CELL}
""",
)
def q98_per_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing caps: keep at most {_CAP_PER_CELL} documents per
    (lang, source) cell, chosen by a seeded md5 draw — the
    over-represented-source downweighting stage of corpus assembly
    (bound how much of any one crawl/domain enters the mix).

    Same determinism contract as q69/q39: content-addressed rank, no
    rand(), reproducible across runs, engines and corpus reshuffles.
    One window exchange on (lang, source); a pathologically heavy cell
    can swap in the groupBy + min_by(k) partial-agg form, which caps
    per-task state at k rows instead of the cell's row count."""
    d = t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(h, F.col("doc_id"))
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _CAP_PER_CELL)
        .select("doc_id", "lang", "source", F.col("rn").cast("int"))
    )


_BUILD_MIN_TOKENS = 20  # quality gate: drop very short docs
_BUILD_CAP = 50  # per-(lang, source) mixing cap


@register(
    "q99_corpus_build",
    tags=("llm-data", "pipeline", "dedup", "sampling", "flagship"),
    oracle=rf"""
WITH staged AS (
  SELECT doc_id, lang, source,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tokens,
         md5(lower(trim(text))) AS fp
  FROM documents
),
keepers AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS dup_rank
  FROM staged
),
quality AS (
  SELECT doc_id, lang, source, n_tokens, fp
  FROM keepers
  WHERE dup_rank = 1 AND n_tokens >= {_BUILD_MIN_TOKENS}
),
capped AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang, source
    ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM quality
)
SELECT doc_id, lang, source, n_tokens, fp, CAST(rn AS INT) AS rn
FROM capped WHERE rn <= {_BUILD_CAP}
""",
)
def q99_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP composite: the training-corpus assembly pipeline as one
    declarative DataFrame DAG — exact dedup (keep lowest doc_id per
    normalized-text fingerprint) → quality gate (≥{_BUILD_MIN_TOKENS}
    tokens) → per-(lang, source) mixing cap ({_BUILD_CAP} docs by
    seeded md5 draw) → manifest rows.

    The point of expressing the WHOLE pipeline as one plan (rather than
    materializing between stages): Catalyst sees it end to end — the
    fingerprint/token projections compute once per row in the scan
    stage, the quality filter prunes before the cap shuffle, and the
    job runs in exactly TWO exchanges (fp window, then (lang, source)
    window — plan-asserted). At 100 TB each stage is the already-proven
    scale shape (q40's hash dedup, q31's map-side gate, q98's capped
    draw); chaining them adds no new shuffle beyond the two windows."""
    from ..functions.text import tokens

    d = t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    staged = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.md5(norm).alias("fp"),
    )
    w_dup = Window.partitionBy("fp").orderBy("doc_id")
    quality = (
        staged.withColumn("dup_rank", F.row_number().over(w_dup))
        .filter(
            (F.col("dup_rank") == 1)
            & (F.col("n_tokens") >= _BUILD_MIN_TOKENS)
        )
        .drop("dup_rank")
    )
    h = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    w_cap = Window.partitionBy("lang", "source").orderBy(h, F.col("doc_id"))
    return (
        quality.withColumn("rn", F.row_number().over(w_cap).cast("int"))
        .filter(F.col("rn") <= _BUILD_CAP)
    )


_WS_DEN = 256  # weight denominator (power of two => exact division)


@register(
    "q104_weighted_downsample",
    tags=("llm-data", "sampling", "weighted"),
    oracle=rf"""
WITH staged AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tokens,
         ('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, n_tokens, u
FROM staged
WHERE u < LEAST(CAST(n_tokens AS DOUBLE) / {_WS_DEN}, 1.0)
""",
)
def q104_weighted_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling: keep each document with
    probability w = min(n_tokens/{_WS_DEN}, 1) — longer (higher-signal)
    docs survive proportionally more often — but DETERMINISTICALLY:
    the uniform draw u is the first 32 md5 bits of a seeded key mapped
    to [0,1). Both u (dyadic: int/2^32) and w (denominator a power of
    two) are exact doubles, so the u < w cut cannot flip between
    engines and the sample is reproducible across runs and reshuffles
    — rand() gives neither. Pure scan projection + filter: ZERO
    exchanges (asserted), which is the only acceptable shape for a
    100 TB downsampling pass."""
    from ..functions.text import tokens

    d = t(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("w:"), F.col("doc_id").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    w = F.least(F.col("n_tokens").cast("double") / _WS_DEN, F.lit(1.0))
    return staged.filter(F.col("u") < w)


@register(
    "q115_corpus_accounting",
    tags=("llm-data", "pipeline", "accounting", "lineage"),
    oracle=rf"""
WITH staged AS (
  SELECT doc_id, lang, source,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tokens,
         md5(lower(trim(text))) AS fp
  FROM documents
),
keepers AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS dup_rank
  FROM staged
),
deduped AS (SELECT * FROM keepers WHERE dup_rank = 1),
quality AS (SELECT * FROM deduped WHERE n_tokens >= {_BUILD_MIN_TOKENS}),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lang, source
      ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM quality
  ) WHERE rn <= {_BUILD_CAP}
)
SELECT * FROM (
  SELECT 0 AS stage_no, 'input' AS stage, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM staged
  UNION ALL
  SELECT 1, 'after_exact_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
  FROM deduped
  UNION ALL
  SELECT 2, 'after_quality_gate', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
  FROM quality
  UNION ALL
  SELECT 3, 'after_source_caps', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
  FROM capped
)
""",
)
def q115_corpus_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-build accounting: document and token counts after each stage
    of q99's pipeline (input → exact dedup → quality gate → mixing
    caps) — the loss/retention audit table every corpus release
    publishes, and the lineage evidence reviewers ask for ("where did
    40% of the tokens go?").

    One DAG: the staged projection computes once; each stage is a
    filter refinement of the previous, and Catalyst shares the
    upstream windows across the four aggregates. Integer counts only —
    engine-exact."""
    from ..functions.text import tokens

    d = t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    staged = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.md5(norm).alias("fp"),
    )
    w_dup = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        staged.withColumn("dup_rank", F.row_number().over(w_dup))
        .filter(F.col("dup_rank") == 1)
        .drop("dup_rank")
    )
    quality = deduped.filter(F.col("n_tokens") >= _BUILD_MIN_TOKENS)
    h = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    w_cap = Window.partitionBy("lang", "source").orderBy(h, F.col("doc_id"))
    capped = (
        quality.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= _BUILD_CAP)
    )

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )

    return (
        stage(staged, 0, "input")
        .unionByName(stage(deduped, 1, "after_exact_dedup"))
        .unionByName(stage(quality, 2, "after_quality_gate"))
        .unionByName(stage(capped, 3, "after_source_caps"))
    )


_TEMP_SEED = "temp:"


@register(
    "q120_temperature_mixing",
    tags=("llm-data", "sampling", "mixing", "temperature"),
    oracle=f"""
WITH g AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
m AS (SELECT MIN(n_g) AS n_min FROM g),
w AS (
  SELECT lang, n_g,
         sqrt(CAST(n_min AS DOUBLE) / CAST(n_g AS DOUBLE)) AS keep_w
  FROM g, m
)
SELECT d.doc_id, d.lang, w.keep_w
FROM documents d JOIN w USING (lang)
WHERE ('0x' || substr(md5('{_TEMP_SEED}' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        / 4294967296.0
      < w.keep_w
""",
)
def q120_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixing (α = 0.5): keep each doc
    with probability ∝ p_lang^(α−1) = 1/√p_lang, normalized so the
    rarest language keeps everything — the standard move (mT5/XLM-R
    style) to stop a head language from dominating a multilingual
    training mix while still over-representing it.

    α is FIXED at 1/2 deliberately: the weight is then
    sqrt(n_min/n_lang), and sqrt and division are correctly-rounded
    IEEE-754 ops — bit-identical in Spark and DuckDB — where a general
    pow() is libm-dependent and could flip a draw at the boundary. The
    draw u is the dyadic md5 uniform (int32/2^32) of q39/q104, so the
    u < w cut is exact cross-engine and the sample is reproducible
    under reshuffles and re-ingests.

    Scale shape: per-lang counts are a TINY aggregate (partial agg →
    |langs| rows) broadcast back onto the scan; the corpus pass itself
    is projection + filter, no corpus-wide exchange. At 100 TB the
    group table is a corpus statistic you'd snapshot with the rest of
    the mix config."""
    d = t(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_g"))
    m = g.agg(F.min("n_g").alias("n_min"))
    w = g.crossJoin(F.broadcast(m)).select(
        "lang",
        F.sqrt(
            F.col("n_min").cast("double") / F.col("n_g").cast("double")
        ).alias("keep_w"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(_TEMP_SEED), F.col("doc_id").cast("string"))
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        d.join(F.broadcast(w), "lang")
        .filter(u < F.col("keep_w"))
        .select("doc_id", "lang", "keep_w")
    )


_MIX_TARGETS = [("en", 0.4), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)]
_SQL_MIX_TARGETS = ", ".join(f"('{l}', {w!r}e0)" for l, w in _MIX_TARGETS)


@register(
    "q147_target_mix_rebalance",
    tags=("llm-data", "sampling", "mixing", "rebalance"),
    oracle=f"""
WITH tgt(lang, share) AS (VALUES {_SQL_MIX_TARGETS}),
cnt AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_l
  FROM documents d JOIN tgt ON tgt.lang = d.lang
  GROUP BY d.lang
),
nstar AS (
  SELECT CAST(MIN(CAST(floor(c.n_l / t.share) AS BIGINT)) AS BIGINT) AS n_star
  FROM cnt c JOIN tgt t ON t.lang = c.lang
),
take AS (
  SELECT t.lang,
         CAST(floor(t.share * ns.n_star) AS BIGINT) AS k_l
  FROM tgt t, nstar ns
),
ranked AS (
  SELECT d.doc_id, d.lang,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY md5('mix:' ||
                        COALESCE(CAST(d.doc_id AS VARCHAR), '<null>')),
                    d.doc_id ASC NULLS FIRST)
           AS rk
  FROM documents d JOIN tgt ON tgt.lang = d.lang
)
SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
FROM ranked r JOIN take k ON k.lang = r.lang
WHERE r.rk <= k.k_l
""",
)
def q147_target_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a TARGET language distribution — the
    data-mix operator proper: given target shares, find the largest
    corpus N* every language can support (min over floor(n_l/share_l)),
    then keep exactly floor(share_l * N*) docs per language by
    content-addressed md5 rank. Unlike q98's per-cell CAPS (an upper
    bound) this hits the mix itself, which is what a training run's
    data card specifies.

    Determinism: per-language counts and N* are exact integers; shares
    appear as e-notation double literals in the oracle (non-dyadic
    0.15 parses as exact DECIMAL otherwise — the q144 ulp trap); the
    draw is the same md5 ranking as q39/q69/q98, reshuffle-stable and
    seedable via the tag.

    Scale shape: one grouped count (map-side combined) -> a 5-row
    broadcast of per-language quotas; the selection itself is one
    md5-rank window per language partition — a single corpus exchange
    keyed on lang, with the skew note that a dominant language makes
    one partition hot (salt the rank into md5-prefix sub-partitions and
    re-rank hierarchically when one lang is >50% of 100 TB)."""
    d = t(spark, sf_dir, "documents")
    tgt = literal_df(
        spark, [(l, float(w)) for l, w in _MIX_TARGETS], ["lang", "share"]
    )
    cnt = (
        d.join(F.broadcast(tgt), "lang")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_l"))
    )
    nstar = (
        cnt.join(F.broadcast(tgt), "lang")
        .select(
            F.floor(F.col("n_l") / F.col("share")).cast("bigint").alias("cap")
        )
        .agg(F.min("cap").alias("n_star"))
    )
    take = tgt.crossJoin(F.broadcast(nstar)).select(
        "lang",
        F.floor(F.col("share") * F.col("n_star")).cast("bigint").alias("k_l"),
    )
    # coalesced hash + pinned NULL tiebreak (q69's dup/NULL-id lesson)
    w = Window.partitionBy("lang").orderBy(
        F.md5(
            F.concat(
                F.lit("mix:"),
                F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>")),
            )
        ),
        F.col("doc_id").asc_nulls_first(),
    )
    ranked = (
        d.join(F.broadcast(tgt.select("lang")), "lang")
        .select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
    )
    return ranked.join(F.broadcast(take), "lang").filter(
        F.col("rk") <= F.col("k_l")
    ).select("doc_id", "lang", "rk")


@register(
    "q165_source_diversity",
    tags=("documents", "llm-data", "mixing", "diversity"),
    oracle="""
WITH per_src AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, source
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_source_share,
       1e0 - CAST(SUM(c * c) AS DOUBLE) / (SUM(c) * SUM(c)) AS gini_simpson,
       CAST(SUM(c) * SUM(c) AS DOUBLE) / SUM(c * c) AS effective_sources
FROM per_src
GROUP BY lang
""",
)
def q165_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixing diversity per language: Gini–Simpson index
    (1 − Σp²) and the inverse-Simpson EFFECTIVE source count (n²/Σc²)
    — 'we ingest from 40 sources' means nothing if effective_sources
    is 2.3; this is the number a mixing policy (q120/q147) is steering
    and the one to alert on when a crawler silently dies.

    Deliberately Simpson, NOT Shannon: entropy needs log(), whose
    last-ulp differs between the JVM's fdlibm and DuckDB's libm — the
    Simpson family is pure integer sums with ONE final double divide,
    so it is engine-exact by construction (and the 'effective count'
    reading is the same). Shape: two nested hash aggs — corpus →
    (lang, source) counts map-side-combined, then |langs| rows."""
    d = t(spark, sf_dir, "documents")
    per_src = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c")
    sc = F.sum(c)
    scc = F.sum(c * c)
    return per_src.groupBy("lang").agg(
        sc.cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_sources"),
        (F.max(c).cast("double") / sc).alias("top_source_share"),
        (F.lit(1.0) - scc.cast("double") / (sc * sc)).alias("gini_simpson"),
        ((sc * sc).cast("double") / scc).alias("effective_sources"),
    )


# Poisson(1) inverse-CDF thresholds on the 32-bit md5 bucket: integer
# compares only — the weight ladder is bit-identical in both engines.
# P[k > 8] ≈ 1.1e-6 collapses into the top rung.
_BOOT_B = 32


def _poisson_cuts() -> list[int]:
    import math

    cum = 0.0
    cuts = []
    for k in range(9):
        cum += math.exp(-1.0) / math.factorial(k)
        cuts.append(min(int(cum * 2**32), 2**32))
    return cuts


_BOOT_CUTS = _poisson_cuts()


def _sql_boot_weight(bucket: str) -> str:
    clauses = " ".join(
        f"WHEN {bucket} < {c} THEN {k}" for k, c in enumerate(_BOOT_CUTS)
    )
    return f"(CASE {clauses} ELSE 9 END)"


@register(
    "q172_bootstrap_ci",
    tags=("relational", "sampling", "stats", "bootstrap"),
    oracle=f"""
WITH expanded AS (
  SELECT b.b, o.o_totalprice,
         ('0x' || substr(md5('boot' || CAST(b.b AS VARCHAR) || ':'
                             || CAST(o.o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           AS bucket
  FROM orders o, (SELECT unnest(range(0, {_BOOT_B})) AS b) b
),
reps AS (
  -- a replicate whose Poisson weights all drew 0 resampled NOTHING:
  -- its mean is undefined, and the unguarded division is an engine
  -- divergence (Spark ANSI errors, DuckDB does not) — drop it in both
  -- engines (all_one fixture, r10; probability ~0 on real corpora)
  SELECT b,
         CAST(CAST(SUM(CAST({_sql_boot_weight('bucket')} * o_totalprice
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
           / SUM({_sql_boot_weight('bucket')}) AS rep_mean
  FROM expanded
  GROUP BY b
  HAVING SUM({_sql_boot_weight('bucket')}) > 0
),
rq AS (
  SELECT CAST(FLOOR(rep_mean * 1000000.0) AS BIGINT) AS rmq FROM reps
),
hist AS (
  {sql_int_hist('rq', 'rmq')}
)
SELECT (SELECT CAST(COUNT(*) AS INT) FROM reps) AS n_replicates,
       (SELECT MIN(rep_mean) FROM reps) AS boot_min,
       (SELECT MAX(rep_mean) FROM reps) AS boot_max,
       {sql_at_rank('rmq', 1, 40)} AS boot_p025_q,
       {sql_at_rank('rmq', 1, 2)} AS boot_p50_q,
       {sql_at_rank('rmq', 39, 40)} AS boot_p975_q
FROM hist
""",
)
def q172_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean order value —
    THE distributed bootstrap (Chamandy et al.'s Poisson trick): a
    with-replacement resample of n rows is approximated by giving each
    row an independent Poisson(1) weight per replicate, which needs no
    global count, no sampling pass, and no state — each of the 32
    replicates is just a weighted aggregate in the SAME single scan.

    Determinism: the Poisson draw is inverse-CDF on the 32-bit
    md5('boot{{b}}:' || orderkey) bucket against PRECOMPUTED integer
    thresholds (q39's discipline — no doubles, no rand()); replicate
    means are decimal-sum ratios. r8 de-float: the CI endpoints were
    interpolated percentiles over the replicate means — the
    engine-version ulp hazard (q166's class) — and are now discrete
    rank statistics on the FLOOR(·1e6)-quantized means (at_rank over
    the replicate int_hist, ranks ceil(B/40)/ceil(B/2)/ceil(39B/40)).
    boot_min/max stay raw doubles: selections of a pinned expression,
    no arithmetic.

    Shape: one scan exploded ×32 — partial aggregation collapses each
    partition's fan-out to 32 (b, sums) rows before the exchange, so
    the shuffle is 32·partitions rows regardless of corpus size; the
    CI aggregate sees exactly 32 rows. At 100 TB the same plan holds;
    raise B, not the shuffle."""
    o = t(spark, sf_dir, "orders")
    b_df = spark.range(_BOOT_B).select(F.col("id").cast("int").alias("b"))
    expanded = o.crossJoin(F.broadcast(b_df)).select(
        "b",
        "o_totalprice",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("bucket"),
    )
    w = F.lit(9)
    for k in range(len(_BOOT_CUTS) - 1, -1, -1):
        w = F.when(F.col("bucket") < _BOOT_CUTS[k], k).otherwise(w)
    # zero-weight replicates resampled nothing — drop BEFORE the
    # division (Spark ANSI errors on /0 where DuckDB does not; all_one
    # fixture, r10). The filter is a no-op on any real corpus.
    reps = (
        expanded.groupBy("b")
        .agg(
            F.sum((w * F.col("o_totalprice")).cast(DEC)).alias("_num"),
            F.sum(w).alias("_ws"),
        )
        .filter(F.col("_ws") > 0)
        .select(
            "b", (F.col("_num").cast("double") / F.col("_ws")).alias("rep_mean")
        )
    )
    # n_replicates reports the SURVIVING count (ADVICE r10: the
    # zero-weight HAVING can drop replicates, so the requested constant
    # B would overstate what the rank statistics were computed over)
    minmax = reps.agg(
        F.count(F.lit(1)).cast("int").alias("n_replicates"),
        F.min("rep_mean").alias("boot_min"),
        F.max("rep_mean").alias("boot_max"),
    )
    hist = int_hist(
        reps.select(
            F.floor(F.col("rep_mean") * F.lit(1_000_000.0))
            .cast("bigint")
            .alias("rmq")
        ),
        "rmq",
    )
    ci = hist.agg(
        at_rank("rmq", 1, 40).alias("boot_p025_q"),
        at_rank("rmq", 1, 2).alias("boot_p50_q"),
        at_rank("rmq", 39, 40).alias("boot_p975_q"),
    )
    return minmax.crossJoin(F.broadcast(ci))


# --------------------------------------------------------------------------
# q231 — weighted systematic sampling (size-proportional, deterministic)
# --------------------------------------------------------------------------

_WSYS_M = 97  # sample target (prime → strides never resonate with weights)


@register(
    "q231_weighted_systematic_sample",
    tags=("llm-data", "sampling", "weighted", "window"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         GREATEST(COALESCE(n_chars, 0), 0) AS wgt,
         md5('wsys:' || COALESCE(CAST(doc_id AS VARCHAR), '<null>')
                     || ':' || COALESCE(source, '<null>')) AS hkey
  FROM documents
),
c AS (
  SELECT doc_id, source, wgt, hkey,
         SUM(wgt) OVER (ORDER BY hkey ASC, doc_id ASC NULLS FIRST,
                                 source ASC NULLS FIRST, wgt ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS w_cum,
         SUM(wgt) OVER () AS w_tot
  FROM w
)
SELECT doc_id, source, CAST(wgt AS BIGINT) AS weight,
       CAST((w_cum * {_WSYS_M}) // w_tot AS BIGINT) AS bucket
FROM c
WHERE w_tot > 0
  AND (w_cum * {_WSYS_M}) // w_tot > ((w_cum - wgt) * {_WSYS_M}) // w_tot
""",
)
def q231_weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-proportional systematic sampling — the deterministic
    replacement for weighted reservoir sampling in corpus-assembly
    pipelines: lay every document on a line in hash order, each
    occupying an interval equal to its weight (chars), and pick the
    document under each of {_WSYS_M} equally-spaced pins. Selection
    probability ∝ weight, no rand(), stable under reshuffles; a doc is
    selected iff the pin index floor(W_i·m/W_tot) advances across its
    interval. All arithmetic is non-negative int64 (identical floor
    division in both engines); the md5 ordering is the same
    content-addressed determinism as q39. The hash input folds in
    ``source`` and the order key appends (source, wgt) after
    (hkey, doc_id), so duplicate or NULL doc_ids can only tie with
    fully interchangeable rows — the cumulative weight under any tie
    order is identical, keeping the selected multiset deterministic
    across runs AND engines (r6 ADVICE finding).

    Scale shape (the part worth reading): the global ordered cumsum is
    NOT a single-partition window at scale — the Spark plan computes
    per-bucket local cumsums (window partitioned by the 2-hex-char
    prefix of the ordering key, 256 buckets) plus exclusive bucket
    offsets from a 256-row rollup broadcast back. Because the bucket
    is a PREFIX of the ordering key, offset + local_cum equals the
    global cumsum exactly — two bucket-keyed exchanges and one 256-row
    broadcast instead of one all-data sort into a single partition."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "source",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(0)).alias(
            "wgt"
        ),
        F.md5(
            F.concat(
                F.lit("wsys:"),
                F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>")),
                F.lit(":"),
                F.coalesce(F.col("source"), F.lit("<null>")),
            )
        ).alias("hkey"),
    ).withColumn("b", F.substring("hkey", 1, 2))
    # local cumulative weight within each 256-way prefix bucket
    wloc = (
        Window.partitionBy("b")
        .orderBy(
            F.col("hkey").asc(),
            F.col("doc_id").asc_nulls_first(),
            F.col("source").asc_nulls_first(),
            F.col("wgt").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = w.withColumn("local_cum", F.sum("wgt").over(wloc))
    # exclusive prefix offsets over the 256-row bucket rollup
    btot = w.groupBy("b").agg(F.sum("wgt").alias("b_wgt"))
    woff = (
        Window.orderBy(F.col("b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        "b",
        F.coalesce(F.sum("b_wgt").over(woff), F.lit(0)).alias("b_off"),
        F.sum("b_wgt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("w_tot"),
    )
    c = local.join(F.broadcast(offsets), "b").select(
        "doc_id",
        "source",
        "wgt",
        (F.col("b_off") + F.col("local_cum")).alias("w_cum"),
        "w_tot",
    )
    return c.filter(
        (F.col("w_tot") > 0)
        & (
            F.expr(f"(w_cum * {_WSYS_M}) div w_tot")
            > F.expr(f"((w_cum - wgt) * {_WSYS_M}) div w_tot")
        )
    ).select(
        "doc_id",
        "source",
        F.col("wgt").cast("bigint").alias("weight"),
        F.expr(f"CAST((w_cum * {_WSYS_M}) div w_tot AS BIGINT)").alias(
            "bucket"
        ),
    )


# --------------------------------------------------------------------------
# q249 — deterministic sharded training order (global permutation, no sort)
# --------------------------------------------------------------------------

_ORDER_SHARDS = 8


@register(
    "q249_training_shard_order",
    tags=("llm-data", "sampling", "ordering", "window"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source,
         md5('order:' || COALESCE(CAST(doc_id AS VARCHAR), '<null>')
                      || ':' || COALESCE(source, '<null>')) AS hkey
  FROM documents
),
sharded AS (
  SELECT doc_id, source, hkey,
         CAST(('0x' || substr(hkey, 1, 8))::BIGINT % {_ORDER_SHARDS} AS INT)
           AS shard
  FROM keyed
)
SELECT doc_id, source, shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shard
         ORDER BY hkey ASC, doc_id ASC NULLS FIRST,
                  source ASC NULLS FIRST) - 1 AS BIGINT)
         AS pos_in_shard,
       CAST((ROW_NUMBER() OVER (
         PARTITION BY shard
         ORDER BY hkey ASC, doc_id ASC NULLS FIRST,
                  source ASC NULLS FIRST) - 1)
            * {_ORDER_SHARDS} + shard AS BIGINT) AS global_idx
FROM sharded
""",
)
def q249_training_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TRAINING ORDER: every document gets a stable
    position in a pseudo-random global permutation — hash-sharded,
    hash-ordered within shard, globally interleaved round-robin as
    global_idx = pos·{_ORDER_SHARDS} + shard. The property that
    matters at 100 TB: this is a full global shuffle order produced
    WITHOUT a global sort — each shard orders independently (window
    partitioned by shard), and the interleave formula is collision-
    free by construction (uneven shards leave index gaps, which a
    data loader skips for free; monotone-per-shard and deterministic
    across reruns/reshuffles is the contract that makes training
    resumable and ablations comparable).

    Shape: one shard-partitioned window — embarrassingly parallel
    across shards; shard count dials with the cluster."""
    d = t(spark, sf_dir, "documents")
    hkey = F.md5(
        F.concat(
            F.lit("order:"),
            F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>")),
            F.lit(":"),
            F.coalesce(F.col("source"), F.lit("<null>")),
        )
    )
    keyed = d.select("doc_id", "source", hkey.alias("hkey")).withColumn(
        "shard",
        (
            F.conv(F.substring("hkey", 1, 8), 16, 10).cast("bigint")
            % _ORDER_SHARDS
        ).cast("int"),
    )
    # (source) appended to the tie-break for the same reason as q231:
    # after (hkey, doc_id, source) the only possible ties are between
    # rows identical in every output-relevant column, so the positions
    # assigned under any tie order form the same multiset.
    w = Window.partitionBy("shard").orderBy(
        F.col("hkey").asc(),
        F.col("doc_id").asc_nulls_first(),
        F.col("source").asc_nulls_first(),
    )
    pos = F.row_number().over(w) - 1
    return keyed.select(
        "doc_id",
        "source",
        "shard",
        pos.cast("bigint").alias("pos_in_shard"),
        (pos * _ORDER_SHARDS + F.col("shard")).cast("bigint").alias(
            "global_idx"
        ),
    )
