"""Information-theoretic corpus diagnostics — the entropy/divergence
family a pretraining-data pipeline runs alongside quality scoring:

- doc_token_entropy   : per-document unigram Shannon entropy + TTR,
                        the lexical-diversity signal (template spam
                        and keyword-stuffed pages score near zero;
                        fluent prose scores near ln(vocab)).
- token_js_divergence : Jensen-Shannon divergence between the TRAIN
                        and HELD-OUT token distributions per source,
                        over a hashed feature space — the direct
                        "is my eval set distributionally identical to
                        my train set?" audit of train_val_split's wall.
- user_markov_entropy : per-user first-order transition entropy rate
                        over event paths — the behavioral-complexity
                        twin of events_transition_matrix (bots replay
                        one loop: entropy ~ 0; humans wander).
- zipf_exponent       : per-source OLS slope of ln(count) vs ln(rank)
                        over the frequency head — Zipf's-law fit;
                        sources whose slope deviates far from -1 are
                        template farms or token soup.

All four are oracle-checked EXACTLY: every logarithm goes through
functions/detmath.ln_det (nested-sqrt, correctly-rounded ops only,
bit-identical cross-engine) and every sum of double terms folds over
a NUMERICALLY SORTED bounded list (per-doc vocab, B=256 hash buckets,
per-user |types|^2 transition cells, K=64-row Zipf head), so Spark
and DuckDB produce bit-identical doubles.

Scale shape (100 TB): explode/lead passes are narrow; every groupBy
is a map-side-combined partial agg; every collect_list is over a
BOUNDED group (doc vocab <= doc length; 256 buckets; |types|^2 cells;
64 head rows); no global windows (the Zipf rank window partitions by
source over the per-source VOCAB, which grows ~Heaps-sublinearly, not
over the corpus); driver state zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.functions.detmath import ln_det
from distributed_system_mapreduce_spark.tables import load_table, spread

# Sorted-fold idiom (see curation8): IEEE + is commutative, so folding
# the terms in ANY deterministic multiset order gives bit-identical
# sums in both engines; sorting the doubles themselves is simplest.
_FOLD = ("aggregate(sort_array(collect_list({t})), "
         "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
_FOLD_SQL = ("list_reduce(list_sort(list({t})), (acc, t) -> acc + t)")


def _fold(term: str) -> str:
    return _FOLD.format(t=term)


def _fold_sql(term: str) -> str:
    return _FOLD_SQL.format(t=term)


# ----------------------------------------------------- doc_token_entropy
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy H = ln N - (1/N) * sum_t c_t ln c_t
    (the algebraic form that needs only per-TERM logs of exact integer
    counts — no per-term division before the fold), plus the type-token
    ratio. Near-zero entropy = one token repeated (template/stuffing);
    entropy ~ ln(n_distinct) = maximally diverse.

    Shape: explode -> (doc, tok) partial-agg count -> per-doc fold over
    the doc's own bounded vocab. Docs with no tokens have no rows here
    (no distribution to measure), matching the oracle's empty groups."""
    docs = spread(load_table(spark, "documents", sf_dir))
    cx = (docs.select("doc_id", F.explode(X.tokens()).alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count("*").alias("c")))
    term = f"CAST(c AS DOUBLE) * ({ln_det('c')})"
    return (
        cx.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.expr(_fold(term)).alias("s"),
        )
        .select(
            "doc_id", "n_tokens", "n_distinct",
            (F.expr(ln_det("n_tokens"))
             - F.col("s") / F.col("n_tokens").cast("double"))
            .alias("entropy"),
            (F.col("n_distinct").cast("double")
             / F.col("n_tokens").cast("double")).alias("ttr"),
        )
    )


_ENT_TERM_SQL = f"CAST(c AS DOUBLE) * ({ln_det('c')})"

DOC_TOKEN_ENTROPY_SQL = f"""
WITH cx AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({X.TOKENS_SQL}) AS tok FROM documents)
  GROUP BY doc_id, tok
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         {_fold_sql(_ENT_TERM_SQL)} AS s
  FROM cx GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       ({ln_det('n_tokens')}) - s / CAST(n_tokens AS DOUBLE) AS entropy,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
FROM agg
"""


# --------------------------------------------------- token_js_divergence
B_JS = 256  # hashed-vocabulary buckets (feature hashing keeps the
# per-source state BOUNDED at any corpus size; same md5-prefix bucket
# construction as curation8's DSIR model, so both engines agree)
_JS_BUCKET_EXPR = (
    f"CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT) % {B_JS}")
_HEX = "'0123456789abcdef'"
_JS_BUCKET_SQL = (
    f"((strpos({_HEX}, substr(md5(tok), 1, 1)) - 1) * 4096 + "
    f"(strpos({_HEX}, substr(md5(tok), 2, 1)) - 1) * 256 + "
    f"(strpos({_HEX}, substr(md5(tok), 3, 1)) - 1) * 16 + "
    f"(strpos({_HEX}, substr(md5(tok), 4, 1)) - 1)) % {B_JS}"
)
# train_val_split's hash wall (curation.py): first md5 hex byte of
# doc_id < 'cc' -> train (~80%); everything else is held out.
_IS_TRAIN_EXPR = "substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'cc'"
_IS_TRAIN_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'"


def token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence (nats, in [0, ln 2])
    between the train-side and held-out-side token distributions under
    train_val_split's deterministic hash wall, over a B=256 hashed
    vocabulary. JS ~ 0 means the wall is distributionally clean for
    that source; a large JS means the 'random' split correlates with
    content and per-source eval loss is biased. The token-level
    complement of split_ks_check (which tests doc LENGTHS).

    p/m and q/m stay exact rationals of double-cast counts evaluated
    in one fixed order, logs are ln_det, and the per-source sum folds
    over the sorted 256-bucket term list — bit-identical cross-engine.
    """
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "source",
        F.expr(_IS_TRAIN_EXPR).alias("is_train"),
        F.explode(X.tokens()).alias("tok"),
    ).select("source", "is_train", F.expr(_JS_BUCKET_EXPR).alias("b"))
    cell = tok.groupBy("source", "b").agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_train"), 0).otherwise(1)).alias("ch"),
    )
    tot = tok.groupBy("source").agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0)).alias("tt"),
        F.sum(F.when(F.col("is_train"), 0).otherwise(1)).alias("th"),
    )
    # A source whose docs fall ENTIRELY on one side of the hash wall
    # gives tt or th = 0: Spark (ANSI off) would yield NULL where
    # DuckDB double division yields inf/NaN — drop those sources
    # identically in both engines (no distribution pair to compare).
    tot = tot.filter("tt > 0 AND th > 0")
    # p = ct/tt, q = ch/th; m = (p+q)/2; sources are a bounded set ->
    # totals broadcast onto the (source, bucket) grid.
    p, q = "(CAST(ct AS DOUBLE) / tt)", "(CAST(ch AS DOUBLE) / th)"
    m2 = f"({p} + {q})"  # = 2m; p/m = 2p/(p+q), q/m = 2q/(p+q)
    term = (
        f"CASE WHEN ct > 0 THEN 0.5 * {p} * ({ln_det(f'2.0 * {p} / {m2}')})"
        f" ELSE CAST(0 AS DOUBLE) END + "
        f"CASE WHEN ch > 0 THEN 0.5 * {q} * ({ln_det(f'2.0 * {q} / {m2}')})"
        f" ELSE CAST(0 AS DOUBLE) END"
    )
    return (
        cell.join(F.broadcast(tot), "source")
        .withColumn("term", F.expr(term))
        .groupBy("source")
        .agg(
            F.first("tt").cast("long").alias("train_tokens"),
            F.first("th").cast("long").alias("held_tokens"),
            F.expr(_fold("term")).alias("js_divergence"),
        )
    )


_P_SQL, _Q_SQL = "(CAST(ct AS DOUBLE) / tt)", "(CAST(ch AS DOUBLE) / th)"
_M2_SQL = f"({_P_SQL} + {_Q_SQL})"
_JS_TERM_SQL = (
    f"CASE WHEN ct > 0 THEN 0.5 * {_P_SQL} * "
    f"({ln_det(f'2.0 * {_P_SQL} / {_M2_SQL}')}) ELSE CAST(0 AS DOUBLE) END"
    f" + CASE WHEN ch > 0 THEN 0.5 * {_Q_SQL} * "
    f"({ln_det(f'2.0 * {_Q_SQL} / {_M2_SQL}')}) ELSE CAST(0 AS DOUBLE) END"
)

TOKEN_JS_DIVERGENCE_SQL = f"""
WITH tok AS (
  SELECT source, {_IS_TRAIN_SQL} AS is_train, {_JS_BUCKET_SQL} AS b
  FROM (SELECT doc_id, source, unnest({X.TOKENS_SQL}) AS tok
        FROM documents)
),
cell AS (
  SELECT source, b,
         SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS ch
  FROM tok GROUP BY source, b
),
tot AS (
  SELECT source,
         SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS tt,
         SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS th
  FROM tok GROUP BY source
  HAVING SUM(CASE WHEN is_train THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN is_train THEN 0 ELSE 1 END) > 0
)
SELECT source,
       CAST(ANY_VALUE(tt) AS BIGINT) AS train_tokens,
       CAST(ANY_VALUE(th) AS BIGINT) AS held_tokens,
       {_fold_sql(f'({_JS_TERM_SQL})')} AS js_divergence
FROM cell JOIN tot USING (source)
GROUP BY source
"""


# --------------------------------------------------- user_markov_entropy
def user_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first-order Markov entropy rate over the event-type
    path: H = sum_{a,b} (n_ab / N) * ln(n_a / n_ab) — the conditional
    entropy of the next event given the current one, under the user's
    own empirical transition matrix. Bots that replay one loop score
    ~0; exploratory humans score near ln(|types|). The per-user
    complement of the global events_transition_matrix.

    Shape: lead() window partitioned by user (never global), one
    partial agg to the per-user transition cells (bounded |types|^2),
    n_a via a window over that TINY aggregated table, one more
    per-user fold. ln(n_a / n_ab) is ln_det of an exact integer
    rational; the fold is sorted."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.col("event_type").alias("t_from"),
        F.lead("event_type", 1).over(w).alias("t_to"),
    ).where(F.col("t_to").isNotNull())
    cells = pairs.groupBy("user_id", "t_from", "t_to").agg(
        F.count("*").alias("n_ab"))
    wa = Window.partitionBy("user_id", "t_from")
    term = (f"CAST(n_ab AS DOUBLE) * "
            f"({ln_det('CAST(n_a AS DOUBLE) / n_ab')})")
    return (
        cells.withColumn("n_a", F.sum("n_ab").over(wa))
        .groupBy("user_id")
        .agg(
            F.sum("n_ab").cast("long").alias("n_transitions"),
            F.count("*").cast("long").alias("n_cells"),
            F.expr(_fold(term)).alias("s"),
        )
        .select(
            "user_id", "n_transitions", "n_cells",
            (F.col("s") / F.col("n_transitions").cast("double"))
            .alias("entropy_rate"),
        )
    )


_MK_TERM_SQL = (f"CAST(n_ab AS DOUBLE) * "
                f"({ln_det('CAST(n_a AS DOUBLE) / n_ab')})")

USER_MARKOV_ENTROPY_SQL = f"""
WITH pairs AS (
  SELECT user_id, event_type AS t_from,
         LEAD(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS t_to
  FROM events
),
cells AS (
  SELECT user_id, t_from, t_to, COUNT(*) AS n_ab
  FROM pairs WHERE t_to IS NOT NULL
  GROUP BY user_id, t_from, t_to
),
withna AS (
  SELECT user_id, n_ab,
         SUM(n_ab) OVER (PARTITION BY user_id, t_from) AS n_a
  FROM cells
)
SELECT user_id,
       CAST(SUM(n_ab) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       {_fold_sql(f'({_MK_TERM_SQL})')}
         / CAST(SUM(n_ab) AS DOUBLE) AS entropy_rate
FROM withna
GROUP BY user_id
"""


# -------------------------------------------------------- zipf_exponent
ZIPF_HEAD_K = 64  # head size for the log-log fit; ranks beyond the
# head are noise-dominated at any corpus size and don't sharpen the
# slope, so the per-source fit state is a CONSTANT 64 rows.


def zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf's-law fit: OLS slope of y = ln(count) against
    x = ln(rank) over the source's ZIPF_HEAD_K most frequent tokens.
    Natural text sits near slope -1; a source whose slope is shallow
    (flat head = synthetic uniform vocab) or a cliff (one template
    token dominating) is machine-generated or boilerplate. The
    fitted-statistic upgrade of token_rank_curve's global raw head.

    slope = (K * Sxy - Sx * Sy) / (K * Sxx - Sx^2) with each S a
    sorted fold over the <= 64 head terms; x and y are ln_det of
    exact integers (rank, count) — bit-identical cross-engine. The
    rank window partitions by source over the per-source VOCAB
    (Heaps-sublinear in corpus size), never over the corpus; ties
    break on the token string so the head is deterministic."""
    docs = spread(load_table(spark, "documents", sf_dir))
    counts = (docs.select("source", F.explode(X.tokens()).alias("tok"))
              .groupBy("source", "tok").agg(F.count("*").alias("n")))
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("tok"))
    head = (counts.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= ZIPF_HEAD_K))
    x, y = ln_det("r"), ln_det("n")
    folds = {
        "sx": _fold(f"({x})"),
        "sy": _fold(f"({y})"),
        "sxy": _fold(f"({x}) * ({y})"),
        "sxx": _fold(f"({x}) * ({x})"),
    }
    return (
        head.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_head"),
            *[F.expr(e).alias(k) for k, e in folds.items()],
        )
        .select(
            "source", "n_head",
            ((F.col("n_head") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n_head") * F.col("sxx") - F.col("sx") * F.col("sx")))
            .alias("zipf_slope"),
        )
    )


_ZX, _ZY = ln_det("r"), ln_det("n")

ZIPF_EXPONENT_SQL = f"""
WITH counts AS (
  SELECT source, tok, COUNT(*) AS n
  FROM (SELECT source, unnest({X.TOKENS_SQL}) AS tok FROM documents)
  GROUP BY source, tok
),
head AS (
  SELECT source, n,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n DESC, tok) AS r
  FROM counts
  QUALIFY r <= {ZIPF_HEAD_K}
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_head,
         {_fold_sql(f'({_ZX})')} AS sx,
         {_fold_sql(f'({_ZY})')} AS sy,
         {_fold_sql(f'({_ZX}) * ({_ZY})')} AS sxy,
         {_fold_sql(f'({_ZX}) * ({_ZX})')} AS sxx
  FROM head GROUP BY source
)
SELECT source, n_head,
       (n_head * sxy - sx * sy) / (n_head * sxx - sx * sx) AS zipf_slope
FROM agg
"""


QUERIES = {
    "doc_token_entropy": doc_token_entropy,
    "token_js_divergence": token_js_divergence,
    "user_markov_entropy": user_markov_entropy,
    "zipf_exponent": zipf_exponent,
}

ORACLES = {
    "doc_token_entropy": DOC_TOKEN_ENTROPY_SQL,
    "token_js_divergence": TOKEN_JS_DIVERGENCE_SQL,
    "user_markov_entropy": USER_MARKOV_ENTROPY_SQL,
    "zipf_exponent": ZIPF_EXPONENT_SQL,
}


# ---------------------------------------- reusable JS-divergence pieces
# (the streaming drift monitor scores each micro-batch against the
# FROZEN corpus bucket distribution with exactly this math, so stream
# and batch verdicts agree bit-for-bit)
def token_bucket_counts(docs: DataFrame) -> DataFrame:
    """Global hashed-vocabulary bucket counts (b, n) for a document
    frame — the bounded (B_JS rows) distribution summary either side
    of a JS comparison reduces to."""
    return (docs.select(F.explode(X.tokens()).alias("tok"))
            .select(F.expr(_JS_BUCKET_EXPR).alias("b"))
            .groupBy("b").agg(F.count("*").alias("n")))


def js_between(p_counts: DataFrame, q_counts: DataFrame) -> DataFrame:
    """ONE-row Jensen-Shannon divergence between two bucket-count
    frames from token_bucket_counts: (p_tokens, q_tokens,
    js_divergence). Full-outer on the bounded bucket grid, totals as
    broadcast 1-row aggregates, deterministic-ln terms folded in
    sorted order — identical math to token_js_divergence's per-source
    cells, so a DuckDB twin hash-matches."""
    p = p_counts.select("b", F.col("n").alias("ct"))
    q = q_counts.select("b", F.col("n").alias("ch"))
    cell = (p.join(q, "b", "full")
            .select("b", F.coalesce("ct", F.lit(0)).alias("ct"),
                    F.coalesce("ch", F.lit(0)).alias("ch")))
    tot = cell.groupBy().agg(F.sum("ct").alias("tt"),
                             F.sum("ch").alias("th"))
    pr, qr = "(CAST(ct AS DOUBLE) / tt)", "(CAST(ch AS DOUBLE) / th)"
    m2 = f"({pr} + {qr})"
    term = (
        f"CASE WHEN ct > 0 THEN 0.5 * {pr} * "
        f"({ln_det(f'2.0 * {pr} / {m2}')}) ELSE CAST(0 AS DOUBLE) END + "
        f"CASE WHEN ch > 0 THEN 0.5 * {qr} * "
        f"({ln_det(f'2.0 * {qr} / {m2}')}) ELSE CAST(0 AS DOUBLE) END"
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .withColumn("term", F.expr(term))
        .groupBy()
        .agg(
            F.first("tt").cast("long").alias("p_tokens"),
            F.first("th").cast("long").alias("q_tokens"),
            F.expr(_fold("term")).alias("js_divergence"),
        )
    )
