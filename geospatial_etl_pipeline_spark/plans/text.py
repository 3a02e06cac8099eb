"""Text-analysis queries over the ``documents`` table (SURVEY §2j [EXT]).

Language-ID, quality scoring, token statistics, fingerprinting — all
pure JVM expressions from ``functions.text`` with exact SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    fingerprint,
    punct_count,
    quality_score,
    stopword_hits,
    token_count,
    tokens,
)
from ._util import t
from .catalog import register

# SQL fragments mirroring functions.text builders exactly.
_SQL_NORM = "lower(trim(text))"
_SQL_TOKENS = rf"regexp_split_to_array({_SQL_NORM}, '\s+')"


def _sql_stopword_hits(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"CAST(len(list_filter({_SQL_TOKENS}, t -> t IN ({inlist}))) AS BIGINT)"


@register(
    "q30_text_stats",
    tags=("text", "llm-data"),
    oracle=f"""
SELECT doc_id, lang,
       CAST(LENGTH(text) AS BIGINT) AS text_len,
       CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({_SQL_TOKENS})) AS BIGINT) AS n_unique_tokens,
       CAST(list_sum(list_transform({_SQL_TOKENS}, x -> length(x))) AS DOUBLE)
         / len({_SQL_TOKENS}) AS avg_token_len
FROM documents
""",
)
def q30_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — scan-side only, zero shuffle."""
    d = t(spark, sf_dir, "documents")
    tok = tokens("text")
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("text_len"),
        token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("bigint").alias("n_unique_tokens"),
        (
            F.aggregate(tok, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x))
            .cast("double")
            / F.size(tok)
        ).alias("avg_token_len"),
    )


@register(
    "q31_quality_score",
    tags=("text", "llm-data"),
    oracle=f"""
SELECT doc_id,
       CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
       {_sql_stopword_hits('en')} AS stopword_hits_en,
       CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS punct_cnt,
       LEAST(CAST(len({_SQL_TOKENS}) AS DOUBLE) / 100.0, 1.0) * 0.4
         + (CAST({_sql_stopword_hits('en')} AS DOUBLE)
            / GREATEST(CAST(len({_SQL_TOKENS}) AS DOUBLE), 1.0)) * 0.4
         + CASE WHEN CAST(LENGTH(text) AS DOUBLE) > 0
                THEN 0.2 - LEAST(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
                                 / CAST(LENGTH(text) AS DOUBLE), 0.2)
                ELSE 0.0 END AS quality
FROM documents
""",
)
def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/punctuation quality heuristic (training-data
    filtering stage); one pass, no shuffle."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        stopword_hits("text", "en").alias("stopword_hits_en"),
        punct_count("text").alias("punct_cnt"),
        quality_score("text").alias("quality"),
    )


def _langid_case_sql() -> str:
    en, es, fr = (
        _sql_stopword_hits("en"),
        _sql_stopword_hits("es"),
        _sql_stopword_hits("fr"),
    )
    return f"""CASE WHEN {en} >= {es} AND {en} >= {fr} THEN 'en'
        WHEN {es} >= {fr} THEN 'es' ELSE 'fr' END"""


@register(
    "q32_language_id",
    tags=("text", "llm-data"),
    oracle=f"""
SELECT doc_id, lang,
       {_sql_stopword_hits('en')} AS en_hits,
       {_sql_stopword_hits('es')} AS es_hits,
       {_sql_stopword_hits('fr')} AS fr_hits,
       {_langid_case_sql()} AS pred_lang
FROM documents
""",
)
def q32_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic with a deterministic argmax
    tie-break (en > es > fr)."""
    d = t(spark, sf_dir, "documents")
    en = stopword_hits("text", "en")
    es = stopword_hits("text", "es")
    fr = stopword_hits("text", "fr")
    pred = (
        F.when((en >= es) & (en >= fr), "en")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        "lang",
        en.alias("en_hits"),
        es.alias("es_hits"),
        fr.alias("fr_hits"),
        pred.alias("pred_lang"),
    )


@register(
    "q33_fingerprint",
    tags=("text", "llm-data"),
    oracle=f"""
SELECT doc_id,
       md5(list_aggregate({_SQL_TOKENS}, 'string_agg', ' ')) AS fp,
       CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens
FROM documents
""",
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical whitespace-normalized MD5 fingerprint per document."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        token_count("text").alias("n_tokens"),
    )
