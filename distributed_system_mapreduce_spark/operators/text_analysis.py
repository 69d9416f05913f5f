"""Text-analysis queries over `documents` — the per-document feature
extraction stage of an LLM training-data pipeline (language ID,
quality scoring, token accounting, fingerprinting). All JVM-side
expressions; linear in corpus size; no shuffle except the final
fingerprint aggregation (keyed by doc_id, which is the natural
partitioning of the table at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.tables import load_table


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        X.n_tokens().cast("long").alias("n_ws_tokens"),
        X.bpe_count().cast("long").alias("n_bpe_tokens"),
        F.col("n_chars").alias("n_chars"),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       {X.N_TOKENS_SQL} AS n_ws_tokens,
       {X.BPE_COUNT_SQL} AS n_bpe_tokens,
       n_chars
FROM documents
"""


# Language markers: the synthetic corpus shares one vocabulary across
# langs, so this is the *mechanism* demo (per-language marker-token
# scoring + argmax) — on real corpora the marker lists are per-language
# n-gram tables. Scores are exact integers; argmax tie-breaks on the
# declared language order.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "data", "table"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "de", "los"),
    "zh": ("的", "是", "了"),
}


def _marker_count_expr(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({X.TOKENS_EXPR}, t -> t IN ({inlist})))"


def _marker_count_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({X.TOKENS_SQL}, t -> t IN ({inlist})))"


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID: score each language, argmax with
    fixed tie-break order; emit scores + prediction + truth label."""
    docs = load_table(spark, "documents", sf_dir)
    cols = [F.col("doc_id"), F.col("lang").alias("lang_true")]
    for lg, words in _LANG_MARKERS.items():
        cols.append(
            F.expr(_marker_count_expr(words)).cast("long").alias(f"score_{lg}"))
    scored = docs.select(*cols)
    langs = list(_LANG_MARKERS)
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lg in langs[1:]:
        cand = F.col(f"score_{lg}")
        pred = F.when(cand > best, F.lit(lg)).otherwise(pred)
        best = F.when(cand > best, cand).otherwise(best)
    return scored.withColumn("lang_pred", pred)


_SCORE_COLS_SQL = ",\n       ".join(
    f"{_marker_count_sql(w)} AS score_{lg}" for lg, w in _LANG_MARKERS.items()
)
_LANGS = list(_LANG_MARKERS)
_PRED_SQL = f"'{_LANGS[0]}'"
_BEST_SQL = f"score_{_LANGS[0]}"
for _lg in _LANGS[1:]:
    _PRED_SQL = (
        f"CASE WHEN score_{_lg} > ({_BEST_SQL}) THEN '{_lg}' "
        f"ELSE ({_PRED_SQL}) END"
    )
    _BEST_SQL = (
        f"CASE WHEN score_{_lg} > ({_BEST_SQL}) THEN score_{_lg} "
        f"ELSE ({_BEST_SQL}) END"
    )

LANG_ID_SQL = f"""
SELECT doc_id, lang_true, score_en, score_de, score_fr, score_es,
       score_zh,
       {_PRED_SQL} AS lang_pred
FROM (
  SELECT doc_id, lang AS lang_true,
       {_SCORE_COLS_SQL}
  FROM documents
)
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/punctuation/char-class quality features + a
    composite score. All ratios are int/int double divisions in fixed
    order — bit-identical across engines."""
    docs = load_table(spark, "documents", sf_dir)
    feats = docs.select(
        "doc_id",
        X.n_tokens().cast("long").alias("n_toks"),
        X.stopword_count().cast("long").alias("n_stop"),
        F.expr(r"length(regexp_replace(text, '[^.,;:!?]', ''))")
        .cast("long").alias("n_punct"),
        F.length("text").cast("long").alias("n_len"),
        F.expr(r"length(regexp_replace(text, '[^A-Za-z]', ''))")
        .cast("long").alias("n_alpha"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return feats.select(
        "doc_id", "n_toks", "n_stop", "n_punct",
        (dbl("n_stop") / dbl("n_toks")).alias("stop_ratio"),
        (dbl("n_alpha") / dbl("n_len")).alias("alpha_ratio"),
        (
            F.least(dbl("n_toks") / F.lit(100.0), F.lit(1.0)) * 0.5
            + (dbl("n_stop") / dbl("n_toks")) * 0.25
            + (dbl("n_alpha") / dbl("n_len")) * 0.25
        ).alias("quality"),
    )


QUALITY_SCORE_SQL = f"""
SELECT doc_id, n_toks, n_stop, n_punct,
       CAST(n_stop AS DOUBLE) / CAST(n_toks AS DOUBLE) AS stop_ratio,
       CAST(n_alpha AS DOUBLE) / CAST(n_len AS DOUBLE) AS alpha_ratio,
       least(CAST(n_toks AS DOUBLE) / 100.0, 1.0) * 0.5
         + (CAST(n_stop AS DOUBLE) / CAST(n_toks AS DOUBLE)) * 0.25
         + (CAST(n_alpha AS DOUBLE) / CAST(n_len AS DOUBLE)) * 0.25
         AS quality
FROM (
  SELECT doc_id,
         {X.N_TOKENS_SQL} AS n_toks,
         {X.STOPWORD_COUNT_SQL} AS n_stop,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         length(text) AS n_len,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
)
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: min-md5 over word-bigram shingles (the
    1-hash MinHash / winnowing-style document sketch) + shingle
    cardinality. Two docs sharing the fingerprint are near-dup
    candidates with probability ~ their Jaccard similarity."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", X.tokens().alias("toks"))
    sh = toks.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(X.shingles_from("toks"))))
        .alias("s"),
    )
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("s"))).alias("fingerprint"),
        F.count("*").alias("n_shingles"),
    )


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id, MIN(md5(s)) AS fingerprint, COUNT(*) AS n_shingles
FROM (
  SELECT DISTINCT doc_id, unnest({X.SHINGLES_SQL}) AS s
  FROM documents
)
GROUP BY doc_id
"""


QUERIES = {
    "token_count": token_count,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES = {
    "token_count": TOKEN_COUNT_SQL,
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SCORE_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
}
