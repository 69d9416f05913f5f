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
from distributed_system_mapreduce_spark.lineage import cut


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


QUALITY_TAU = 0.6


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual pipeline stage the features feed: keep documents
    with quality >= tau. Returns the kept set with its score — at
    100 TB this is the write-side of the curation pass (filter is a
    narrow op; nothing shuffles)."""
    scored = quality_score(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source")
    return (
        scored.filter(F.col("quality") >= QUALITY_TAU)
        .join(docs, "doc_id")
        .select("doc_id", "lang", "source", "quality")
    )


QUALITY_FILTER_SQL = f"""
SELECT doc_id, lang, source, quality
FROM ({QUALITY_SCORE_SQL}) q
JOIN (SELECT doc_id AS d2, lang, source FROM documents) d
  ON q.doc_id = d.d2
WHERE quality >= {QUALITY_TAU}
"""


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: per (source, lang) doc counts, token
    totals, high-quality share. Two-level shape: narrow per-doc
    features, then one partial-aggregating shuffle on the
    (source, lang) key. Aggregates are integers only (a
    cross-partition SUM over doubles is order-nondeterministic in
    the last ulp — the per-row threshold compare is not)."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source")
    feats = quality_score(spark, sf_dir).select(
        "doc_id", "n_toks", "quality")
    return (
        docs.join(feats, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum(F.when(F.col("quality") >= QUALITY_TAU, 1)
                  .otherwise(0)).alias("n_high_quality"),
        )
    )


CORPUS_STATS_SQL = f"""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN quality >= {QUALITY_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_quality
FROM ({QUALITY_SCORE_SQL}) q
JOIN (SELECT doc_id AS d2, lang, source FROM documents) d
  ON q.doc_id = d.d2
GROUP BY source, lang
"""


TOP_TERMS = 100


def term_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics: per-term document frequency and
    collection frequency, deterministic top-100 by df. The per-doc
    distinct happens inside the explode (array_distinct — narrow);
    the shuffle aggregates (term -> df) with map-side combine; top-k
    is TakeOrderedAndProject, not a global window."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", X.tokens().alias("toks"))
    per_doc = toks.select(
        "doc_id",
        F.explode(F.array_distinct("toks")).alias("term"),
    )
    all_occ = toks.select(F.explode("toks").alias("term"))
    df_ = per_doc.groupBy("term").agg(F.count("*").alias("doc_freq"))
    cf = all_occ.groupBy("term").agg(F.count("*").alias("coll_freq"))
    return (
        df_.join(cf, "term")
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(TOP_TERMS)
    )


TERM_DOC_FREQ_SQL = f"""
SELECT term, doc_freq, coll_freq
FROM (
  SELECT term, COUNT(*) AS doc_freq
  FROM (SELECT DISTINCT doc_id, unnest({X.TOKENS_SQL}) AS term
        FROM documents)
  GROUP BY term
) d
JOIN (
  SELECT term, COUNT(*) AS coll_freq
  FROM (SELECT unnest({X.TOKENS_SQL}) AS term FROM documents)
  GROUP BY term
) c USING (term)
ORDER BY doc_freq DESC, term ASC
LIMIT {TOP_TERMS}
"""


HLL_REL_ERR = 0.05  # gate bound: 5x the rsd=0.01 sketch's typical error


def approx_distinct_users_by_type(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """HyperLogLog++ sketch path for the 100 TB cardinality question
    (exact twin: distinct_users_by_type) — ORACLE-GATED via the
    ann_recall_eval pattern (r5 verdict item 5): sketch values are
    engine-specific, so the query emits the EXACT distinct count (the
    oracle recomputes it) plus a within-relative-error verdict on the
    HLL estimate (the oracle asserts TRUE). If the sketch ever drifts
    past {HLL_REL_ERR:.0%} of truth the flag flips and the gate goes
    red — the estimate itself is additionally bounded in
    tests/test_queries_oracle.py by an independent recompute.

    Scale: one grouped aggregate computes both sides here; at 100 TB
    you'd ship ONLY the mergeable sketch (no exact twin) — this entry
    certifies the sketch you'd ship against the truth while truth is
    still computable."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01)
            .alias("_approx"),
        )
        .select(
            "event_type", "exact_users",
            (F.abs(F.col("_approx") - F.col("exact_users"))
             <= F.col("exact_users") * HLL_REL_ERR)
            .alias("within_bound"),
        )
    )


APPROX_DISTINCT_USERS_BY_TYPE_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events
GROUP BY event_type
"""


def rare_token_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rare-token rate: the share of a doc's tokens whose
    corpus frequency sits below the 25th percentile of the vocabulary's
    frequency distribution — the OOV/typo-noise quality signal a
    curation pass thresholds on (CCNet-style rare-vocab filtering).

    Plan shape at 100 TB: ONE tokenize+explode pass to the
    per-(doc, token) count table (cut via lineage.cut — it is the
    sufficient statistic for the vocabulary rollup, the rare set, and
    the per-doc rare count, which previously each re-tokenized the
    corpus; r7 scan audit). The barrier here materializes a
    CORPUS-scale table (unlike the vocab-scale intermediates cut
    elsewhere): the explicit trade is one tokenize scan saved vs
    near-token-stream-sized storage. On a cluster run the session
    posture (lineage.py) makes that storage MEMORY_AND_DISK with
    lineage preserved, so it spills rather than OOMs and an executor
    loss recomputes the lost partitions; if storage is tighter than
    scan time, drop this cut and let the two consumers re-scan.
    Also one narrow pass for the doc universe
    (zero-token docs have no count rows). The vocabulary rollup is a
    toy re-agg whose OUTPUT is vocab-sized (« corpus); the percentile
    threshold is an aggregate over that small table, broadcast back
    as a 1-row cross join; the rare-token SET is broadcast into the
    count table (vocab-bounded — switch to a shuffle equi-join on
    token if the vocab outgrows broadcast); the per-doc rollup
    shuffles on doc_id. Rates are a single division of exact ints ->
    deterministic double.
    """
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", X.n_tokens().cast("long").alias("n_tokens"))
    cx = (
        docs.select(
            "doc_id", F.explode(F.expr(X.TOKENS_EXPR)).alias("t"))
        .groupBy("doc_id", "t").agg(F.count("*").alias("c"))
        .transform(cut)
    )
    cf = cx.groupBy("t").agg(F.sum("c").alias("cf"))
    thr = cf.agg(F.expr("percentile(cf, 0.25)").alias("thr"))
    rare = cf.join(F.broadcast(thr), F.col("cf") < F.col("thr")) \
             .select("t")
    rc = (
        cx.join(F.broadcast(rare), "t")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_rare"))
    )
    return (
        base.join(rc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_rare", F.lit(0)).cast("long").alias("n_rare"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("n_rare", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)).alias("rare_rate"),
        )
    )


RARE_TOKEN_RATE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({X.TOKENS_SQL}) AS t FROM documents
),
cf AS (SELECT t, COUNT(*) AS cf FROM tok GROUP BY t),
thr AS (SELECT quantile_cont(cf, 0.25) AS thr FROM cf),
rare AS (SELECT t FROM cf, thr WHERE cf < thr),
rc AS (
  SELECT doc_id, COUNT(*) AS n_rare
  FROM tok JOIN rare USING (t) GROUP BY doc_id
)
SELECT d.doc_id,
       {X.N_TOKENS_SQL} AS n_tokens,
       CAST(COALESCE(n_rare, 0) AS BIGINT) AS n_rare,
       CASE WHEN {X.N_TOKENS_SQL} > 0 THEN
         CAST(COALESCE(n_rare, 0) AS DOUBLE)
           / CAST({X.N_TOKENS_SQL} AS DOUBLE)
       ELSE 0.0 END AS rare_rate
FROM documents d LEFT JOIN rc USING (doc_id)
"""


QUERIES = {
    "token_count": token_count,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "quality_filter": quality_filter,
    "corpus_stats": corpus_stats,
    "term_doc_freq": term_doc_freq,
    "doc_fingerprint": doc_fingerprint,
    "approx_distinct_users_by_type": approx_distinct_users_by_type,
    "rare_token_rate": rare_token_rate,
}

ORACLES = {
    "token_count": TOKEN_COUNT_SQL,
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SCORE_SQL,
    "quality_filter": QUALITY_FILTER_SQL,
    "corpus_stats": CORPUS_STATS_SQL,
    "term_doc_freq": TERM_DOC_FREQ_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    # sketch value is engine-specific, so the gated row emits the
    # exact count + a within-bound verdict the oracle asserts TRUE
    "approx_distinct_users_by_type": APPROX_DISTINCT_USERS_BY_TYPE_SQL,
    "rare_token_rate": RARE_TOKEN_RATE_SQL,
}
