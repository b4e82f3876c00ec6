"""LLM-data-pipeline query inventory: deduplication, text analysis,
similarity search, multimodal plumbing (the north-star extension surface).

Cross-engine determinism: all hashing goes through the portable
``hash32``/md5 primitives (functions/hashing.py) so Spark, DuckDB, and the
Python test oracles agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table


# --------------------------------------------------------------------------
# q31 — exact deduplication (hash-groupBy)
# --------------------------------------------------------------------------
def q31_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: group by content hash, keep the lowest doc_id as
    the canonical survivor. One hash-aggregate on md5(text) — the 100 TB
    plan groups on the digest (16 bytes) rather than the full text so the
    shuffle carries fixed-width keys."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


Q31_ORACLE = """
SELECT md5(text) AS text_md5,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


# --------------------------------------------------------------------------
# q36 — token counting + text quality scoring
# --------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

def q36_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: whitespace token count, BPE-ish regex
    token count, char stats, stopword ratio, and a composite quality score.
    Pure JVM-side expressions — per-row, no shuffle, scan-parallel at any
    scale."""
    docs = table(spark, sf_dir, "documents")
    text = F.col("text")
    words = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(words)
    n_bpeish = F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0)).cast("double")
    alpha_ratio = n_alpha.cast("double") / F.nullif(n_chars, F.lit(0)).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        n_bpeish.alias("n_bpeish_tokens"),
        n_stop.alias("n_stopwords"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(
            (F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
             + alpha_ratio * 0.3
             + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2),
            6,
        ).alias("quality_score"),
    )


_STOP_SQL = "('the','a','an','and','or','of','to','in','is','on')"

Q36_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, text,
         length(text) AS n_chars_computed,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpeish_tokens,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {_STOP_SQL})) AS n_stopwords,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
  FROM documents
)
SELECT doc_id, lang, n_chars_computed, n_tokens, n_bpeish_tokens, n_stopwords,
       round(CAST(n_stopwords AS DOUBLE) / nullif(n_tokens, 0), 6) AS stopword_ratio,
       round(CAST(n_alpha AS DOUBLE) / nullif(n_chars_computed, 0), 6) AS alpha_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.5
             + (CAST(n_alpha AS DOUBLE) / nullif(n_chars_computed, 0)) * 0.3
             + least((CAST(n_stopwords AS DOUBLE) / nullif(n_tokens, 0)) * 5.0, 1.0) * 0.2,
             6) AS quality_score
FROM base
"""


from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs

SPECS = make_specs(
    [
        ("q31_dedup_exact", q31_dedup_exact, Q31_ORACLE, (), "exact hash dedup"),
        ("q36_text_quality", q36_text_quality, Q36_ORACLE, (), "token counts + quality score"),
    ]
)
