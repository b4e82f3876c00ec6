"""Text-analysis operators: language ID, quality metrics, token counting,
document fingerprinting.

All per-row JVM-side expressions (split / regexp / array higher-order
functions) — scan-parallel, shuffle-free, whole-stage-codegen'd; the
natural building blocks of a 100 TB filter stage where every row is
touched once and the output is a score column, not a new table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.tokenize import (
    norm_words,
    word_ngrams,
)
from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32

# Tiny function-word inventories — the classic cheap language-ID signal.
# (zh is ideographic; for ASCII corpora its score is the non-ASCII ratio.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "un", "una"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}


# Shared with operators/dedup.py via functions/tokenize.py — see that
# module for why the two pipelines must tokenize identically.
_words = norm_words


def lang_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-language marker-word occurrence counts + a deterministic argmax
    prediction (priority order en > es > de > fr on ties; 'und' when all
    scores are zero)."""
    words = _words(text_col)
    score_cols = {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    sel = [F.col(id_col), F.col("lang").alias("lang_label")] if "lang" in df.columns else [F.col(id_col)]
    out = df.select(
        *sel, *[c.alias(f"score_{lang}") for lang, c in score_cols.items()]
    )
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    # Build the CASE chain back-to-front so earlier languages win ties.
    for lang in reversed(langs):
        cond = (F.col(f"score_{lang}") > 0)
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (F.col(f"score_{lang}") > F.col(f"score_{other}"))
            elif other != lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
) -> DataFrame:
    """TF-IDF as pure DataFrame algebra (long form: one row per
    (doc, term)): tf = in-doc term count, idf = ln((N+1)/(df+1)) + 1
    (smoothed, sklearn-style), tfidf = tf·idf.

    Two aggregations: (doc, term) counts, then term document-frequencies —
    both shuffle on compact keys; the N scalar joins in as a broadcast
    (literal) value. Unlike MLlib's HashingTF this keeps real terms (no
    feature hashing), which is what a dedup/quality pipeline wants at the
    exploration stage; at 100 TB the term dimension gets capped by
    ``min_df``/stop-lists before any vectorization.
    """
    words = _words(text_col)
    exploded = df.select(F.col(id_col), F.explode(words).alias("term"))
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # N stays a lazy 1-row aggregate cross-joined in (broadcast-nested-loop
    # of a single row) — no eager job at plan-construction time.
    n_docs = df.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("__n_docs")
    )
    doc_freq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    idf = F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(doc_freq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(idf + F.lit(1e-9), 6).alias("idf"),
            F.round(F.col("tf") * idf + F.lit(1e-9), 6).alias("tfidf"),
        )
    )


def fingerprints(
    df: DataFrame, id_col: str, text_col: str, shingle_words: int = 5
) -> DataFrame:
    """Document fingerprints: full-content MD5 plus winnowing-style
    min/max hashes over rolling word ``shingle_words``-grams.

    The min-hash-of-shingles fingerprint is stable under small edits
    (only 1/k of shingles change), which full-digest fingerprints are not
    — the standard rolling-hash trick (Rabin/winnowing family), here with
    word-level shingles and the cross-engine hash32."""
    words = _words(text_col)
    norm = F.array_join(words, " ")
    shingles = word_ngrams(words, shingle_words)
    hashes = F.transform(shingles, hash32)
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.array_min(hashes).alias("fp_min_shingle"),
        F.array_max(hashes).alias("fp_max_shingle"),
        F.size(hashes).cast("long").alias("n_shingles"),
    )


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-document repeated token spans (q198's operator —
    the cut-and-remove ExactSubstr dedup form at n-gram granularity):
    per document, every maximal run of consecutive ``w``-grams that also
    appear in ≥ ``min_docs`` distinct documents, as 1-based token
    coordinates ``(start_pos, end_pos, span_tokens)``.

    Plan: per-doc lead() windows build the grams (doc-length-bounded
    sorts); ONE grouped aggregate finds repeated grams (the only
    corpus-sized shuffle — hash grams to 8-byte keys before it at
    100 TB); a semi-join keeps repeated positions; a gaps-and-islands
    window (pos − row_number) merges adjacent hits into maximal spans.
    Property-tested against a brute-force reference on random corpora
    (tests/test_properties.py::test_repeated_spans_match_reference)."""
    from pyspark.sql import Window

    toks = df.select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos0", "tok"
        ),
    )
    wd = Window.partitionBy(id_col).orderBy("pos0")
    parts = [F.col("tok")]
    for i in range(1, w):
        parts += [F.lit(" "), F.lead("tok", i).over(wd)]
    # grams feed BOTH the repeated-gram aggregate and the probe side —
    # checkpoint the (tokenize + window) subtree once (q104 convention).
    grams = (
        toks.select(
            id_col,
            (F.col("pos0") + 1).alias("pos"),
            F.concat(*parts).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .localCheckpoint(eager=True)
    )
    rep = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    hits = grams.join(rep, "gram", "left_semi").select(id_col, "pos")
    wi = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn("isl", F.col("pos") - F.row_number().over(wi))
    last_tok = F.col("last_gram") + w - 1
    return (
        isl.groupBy(id_col, "isl")
        .agg(F.min("pos").alias("start_pos"), F.max("pos").alias("last_gram"))
        .select(
            id_col,
            F.col("start_pos").cast("long").alias("start_pos"),
            last_tok.cast("long").alias("end_pos"),
            (last_tok - F.col("start_pos") + 1).cast("long").alias(
                "span_tokens"
            ),
        )
    )


def postings_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-token posting-list statistics — the build step of an inverted
    index / BM25 stats table, shared by q152 (batch build), q201 (the
    incrementally-maintained form: history and delta shards each run
    this, then merge additively), and the q201 no-shuffle plan test.
    One pipeline so the three can never drift from the oracle they all
    answer to (Q152_ORACLE). Output: ``(token, df, total_tf,
    top struct<tf, doc_id>)`` — count/sum/struct-max, all algebraic, so
    stats of disjoint document shards MERGE to the whole-corpus stats."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(text_col), "[^a-z0-9]+")).alias("token"),
    ).where(F.col("token") != "")
    tf = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.max(F.struct("tf", "doc_id")).alias("top"),
    )
