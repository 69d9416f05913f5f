"""Curation wave 4: pipeline evaluation + serving-prep operators —
the audit stage that closes the loop on the earlier waves. Language-ID
gets a confusion matrix (how good is the classifier the pipeline
gates on?), tokenization gets a fertility census (the compression
ratio that drives token budgets), dedup gets a cluster-size
distribution (how much mass do the clusters hold?), retrieval gets a
sliding-window chunking audit (the RAG twin of pack_chunks' training
packing), and embeddings get an int8 quantization error census (the
compression decision every vector-serving store makes).

Exactness discipline (same as waves 1-3): counts and closed-form
chunk arithmetic stay in integers; unordered double sums are scaled
to 1e-9-grid BIGINTs before aggregation (order-independent), with
division confined to single fixed-order output expressions; MAX over
doubles is order-independent and used directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.text import (
    BPE_COUNT_SQL,
    N_TOKENS_SQL,
    bpe_count,
    n_tokens,
)
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut


# ------------------------------------------------- tokenizer fertility
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility census per (source, lang): characters per
    token under both tokenizers, and the BPE-to-whitespace blowup —
    the dataset-card number that converts a byte budget into a token
    budget (and flags scripts the tokenizer fragments).

    Shape: one corpus scan, narrow per-doc token counting (JVM regex),
    one partial-agg shuffle on a bounded (source, lang) key space.
    Ratios are single int/int double divisions of already-aggregated
    BIGINTs — deterministic on both engines."""
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "source", "lang", "n_chars",
        n_tokens().cast("long").alias("ws"),
        bpe_count().cast("long").alias("bpe"),
    )
    agg = per.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("ws").cast("long").alias("total_ws_tokens"),
        F.sum("bpe").cast("long").alias("total_bpe_tokens"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        "source", "lang", "n_docs", "total_chars",
        "total_ws_tokens", "total_bpe_tokens",
        (d("total_chars") / d("total_ws_tokens"))
        .alias("chars_per_ws_token"),
        (d("total_chars") / d("total_bpe_tokens"))
        .alias("chars_per_bpe_token"),
        (d("total_bpe_tokens") / d("total_ws_tokens")).alias("bpe_per_ws"),
    )


TOKENIZER_FERTILITY_SQL = f"""
SELECT source, lang, n_docs, total_chars, total_ws_tokens,
       total_bpe_tokens,
       CAST(total_chars AS DOUBLE) / CAST(total_ws_tokens AS DOUBLE)
         AS chars_per_ws_token,
       CAST(total_chars AS DOUBLE) / CAST(total_bpe_tokens AS DOUBLE)
         AS chars_per_bpe_token,
       CAST(total_bpe_tokens AS DOUBLE) / CAST(total_ws_tokens AS DOUBLE)
         AS bpe_per_ws
FROM (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM({N_TOKENS_SQL}) AS BIGINT) AS total_ws_tokens,
         CAST(SUM({BPE_COUNT_SQL}) AS BIGINT) AS total_bpe_tokens
  FROM documents
  GROUP BY source, lang
)
"""


# ---------------------------------------------- language-ID confusion
def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the pipeline's language classifier
    (lang_id's marker-argmax prediction) against the gold `lang`
    label: per (true, predicted) cell count and its share of the true
    language — the eval that decides whether lang-gated curation
    steps can be trusted.

    Shape: one corpus scan (the lang_id scoring projection is narrow
    JVM work), one partial-agg shuffle onto a bounded <=25-cell
    matrix; the per-true totals come from a window over the already
    tiny cell table (partitioned by lang_true — never a global
    window), not a second corpus scan."""
    from distributed_system_mapreduce_spark.operators.text_analysis import (
        lang_id,
    )

    pred = lang_id(spark, sf_dir).select("lang_true", "lang_pred")
    cells = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("lang_true")
    return cells.select(
        "lang_true", "lang_pred", "n",
        (F.col("n").cast("double")
         / F.sum("n").over(w).cast("double")).alias("share_of_true"),
    )


def _lang_confusion_sql() -> str:
    from distributed_system_mapreduce_spark.operators.text_analysis import (
        LANG_ID_SQL,
    )

    return f"""
WITH cells AS (
  SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({LANG_ID_SQL})
  GROUP BY lang_true, lang_pred
)
SELECT lang_true, lang_pred, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY lang_true) AS DOUBLE)
         AS share_of_true
FROM cells
"""


# ------------------------------------------- RAG sliding-window chunks
# Retrieval chunking: WINDOW tokens per chunk, STRIDE tokens between
# chunk starts (overlap = WINDOW - STRIDE). The training-side twin
# (curation3.pack_chunks) packs disjoint windows over a concatenated
# stream; retrieval chunks each doc independently WITH overlap, so
# boundary context is never lost to a cut.
CHUNK_WINDOW = 64
CHUNK_STRIDE = 48

# chunks(n) = 1                          if n <= W
#             1 + ceil((n - W) / S)      otherwise
# Emitted token mass has the closed form n + (chunks - 1) * (W - S):
# every chunk boundary re-emits exactly W - S overlap tokens (the
# last chunk is clipped at n, and chunk k-1 always ends at full W
# because ceil() puts any short remainder in the final chunk only).
_CHUNKS_EXPR = (
    f"CASE WHEN n <= {CHUNK_WINDOW} THEN CAST(1 AS BIGINT) "
    f"ELSE CAST(1 + (n - {CHUNK_WINDOW - CHUNK_STRIDE + 1}) "
    f"div {CHUNK_STRIDE} AS BIGINT) END"
)
_CHUNKS_SQL = (
    f"CASE WHEN n <= {CHUNK_WINDOW} THEN CAST(1 AS BIGINT) "
    f"ELSE CAST(1 + (n - {CHUNK_WINDOW - CHUNK_STRIDE + 1}) "
    f"// {CHUNK_STRIDE} AS BIGINT) END"
)


def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window retrieval-chunking audit per source: how many
    chunks the corpus shards into, how many tokens the overlaps
    re-emit, and the resulting storage expansion — the sizing query
    run before building a RAG index over the corpus.

    Shape: one scan, closed-form integer chunk arithmetic per doc
    (no explode — the audit needs counts, not the chunks themselves),
    one partial-agg shuffle on the bounded source key. The single
    double division happens after aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "source", n_tokens().cast("long").alias("n"),
    ).select(
        "source", "n", F.expr(_CHUNKS_EXPR).alias("chunks"),
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.sum("chunks").cast("long").alias("total_chunks"),
        F.sum((F.col("chunks") - 1)
              * (CHUNK_WINDOW - CHUNK_STRIDE))
        .cast("long").alias("overlap_tokens"),
    )
    return agg.select(
        "source", "n_docs", "total_tokens", "total_chunks",
        "overlap_tokens",
        ((F.col("total_tokens") + F.col("overlap_tokens")).cast("double")
         / F.col("total_tokens").cast("double")).alias("expansion_ratio"),
    )


CHUNK_OVERLAP_SQL = f"""
SELECT source, n_docs, total_tokens, total_chunks, overlap_tokens,
       CAST(total_tokens + overlap_tokens AS DOUBLE)
         / CAST(total_tokens AS DOUBLE) AS expansion_ratio
FROM (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS total_tokens,
         CAST(SUM(chunks) AS BIGINT) AS total_chunks,
         CAST(SUM((chunks - 1) * {CHUNK_WINDOW - CHUNK_STRIDE}) AS BIGINT)
           AS overlap_tokens
  FROM (
    SELECT source, n, {_CHUNKS_SQL} AS chunks
    FROM (SELECT source, {N_TOKENS_SQL} AS n FROM documents)
  )
  GROUP BY source
)
"""


# ------------------------------------------- dup-cluster distribution
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the verified near-dup clusters: per size
    bucket, how many clusters, how many documents they hold, and how
    many dedup would remove (all but one representative per cluster)
    — the report that turns dedup_components' labels into the "X% of
    the corpus is duplicated, mostly in pairs" dataset-card line.

    Shape: downstream of the iterative CC labeling (see
    dedup_components for the round discipline); the label table is
    tiny vs the corpus, so the two groupBys here are partial-agg
    shuffles on small data ending in a bounded 4-row output. Every
    cluster has >= 2 members by construction (labels cover only docs
    with at least one verified dup edge)."""
    from distributed_system_mapreduce_spark.operators.dedup import (
        dedup_components,
    )

    labels = dedup_components(spark, sf_dir)
    sizes = labels.groupBy("component").agg(
        F.count("*").cast("long").alias("sz"))
    bucket = (
        F.when(F.col("sz") <= 2, F.lit("2"))
        .when(F.col("sz") <= 5, F.lit("3-5"))
        .when(F.col("sz") <= 10, F.lit("6-10"))
        .otherwise(F.lit("11+"))
    )
    return (
        sizes.select(bucket.alias("size_bucket"), "sz")
        .groupBy("size_bucket")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            (F.sum("sz") - F.count("*")).cast("long").alias("n_removable"),
        )
    )


def _dedup_cluster_stats_sql() -> str:
    from distributed_system_mapreduce_spark.operators.dedup import (
        DEDUP_COMPONENTS_SQL,
    )

    return f"""
WITH comp AS ({DEDUP_COMPONENTS_SQL}),
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
  FROM comp GROUP BY component
)
SELECT CASE WHEN sz <= 2 THEN '2' WHEN sz <= 5 THEN '3-5'
            WHEN sz <= 10 THEN '6-10' ELSE '11+' END AS size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_removable
FROM sizes
GROUP BY 1
"""


# --------------------------------------- int8 quantization error census
# Symmetric per-vector int8: scale = max|x|, q_i = round(x_i/scale*127),
# dequant = q_i*scale/127. The census reports the reconstruction error
# a serving store would accept by switching float32 -> int8 (4x memory;
# the usual first compression step before PQ).
_ABSMAX_EXPR = "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
_ABSMAX_SQL = ("list_max(list_transform(embedding, "
               "x -> abs(CAST(x AS DOUBLE))))")
# round-half-up via floor(v + 0.5): Spark round() half-up and DuckDB
# round() half-away agree only for positives — floor(v + 0.5) is the
# same op on both engines for all signs. Spark floor() returns BIGINT,
# DuckDB's a DOUBLE; the product with `scale` promotes identically.
_MAXERR_EXPR = (
    "CASE WHEN scale = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) ELSE "
    "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE) - "
    "floor((CAST(x AS DOUBLE) / scale) * 127.0 + 0.5) * scale / 127.0)))"
    " END"
)
_MAXERR_SQL = (
    "CASE WHEN scale = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) ELSE "
    "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE) - "
    "floor((CAST(x AS DOUBLE) / scale) * 127.0 + 0.5) * scale / 127.0)))"
    " END"
)
_NANO = "1000000000.0"


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization error census per label: worst and mean
    per-vector max reconstruction error, mean scale, zero-vector
    count — the accuracy-vs-memory audit before shipping a quantized
    ANN index (compare: ann_topk_pq compresses 64x with codebooks;
    int8 compresses 4x with none).

    Shape: linear narrow scan (per-row array folds, JVM higher-order
    functions — no UDF), one partial-agg shuffle on the bounded label
    key. Cross-engine exactness: MAX over doubles is
    order-independent; mean numerators are summed on a 1e-9 integer
    grid (exact BIGINT sums), with division in one fixed-order output
    expression."""
    vecs = spread(load_table(spark, "embeddings", sf_dir))
    p = vecs.select(
        "label", F.expr(_ABSMAX_EXPR).alias("scale"), "embedding",
    ).select("label", "scale", F.expr(_MAXERR_EXPR).alias("max_err"))
    agg = p.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum((F.col("scale") == 0).cast("long"))
        .cast("long").alias("n_zero_vecs"),
        F.max("max_err").alias("worst_abs_err"),
        F.sum(F.expr(
            f"CAST(floor(max_err * {_NANO} + 0.5) AS BIGINT)"))
        .cast("long").alias("err_sum_nano"),
        F.sum(F.expr(
            f"CAST(floor(scale * {_NANO} + 0.5) AS BIGINT)"))
        .cast("long").alias("scale_sum_nano"),
    )
    return agg.select(
        "label", "n_vecs", "n_zero_vecs", "worst_abs_err",
        "err_sum_nano", "scale_sum_nano",
        ((F.col("err_sum_nano").cast("double") / F.lit(float(1e9)))
         / F.col("n_vecs").cast("double")).alias("mean_abs_err"),
        ((F.col("scale_sum_nano").cast("double") / F.lit(float(1e9)))
         / F.col("n_vecs").cast("double")).alias("mean_scale"),
    )


EMBEDDING_QUANTIZE_SQL = f"""
WITH p AS (
  SELECT label, scale, {_MAXERR_SQL} AS max_err
  FROM (
    SELECT label, {_ABSMAX_SQL} AS scale, embedding
    FROM embeddings
  )
),
agg AS (
  SELECT label,
         CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(CASE WHEN scale = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_vecs,
         MAX(max_err) AS worst_abs_err,
         CAST(SUM(CAST(floor(max_err * {_NANO} + 0.5) AS BIGINT))
              AS BIGINT) AS err_sum_nano,
         CAST(SUM(CAST(floor(scale * {_NANO} + 0.5) AS BIGINT))
              AS BIGINT) AS scale_sum_nano
  FROM p
  GROUP BY label
)
SELECT label, n_vecs, n_zero_vecs, worst_abs_err, err_sum_nano,
       scale_sum_nano,
       (CAST(err_sum_nano AS DOUBLE) / {_NANO})
         / CAST(n_vecs AS DOUBLE) AS mean_abs_err,
       (CAST(scale_sum_nano AS DOUBLE) / {_NANO})
         / CAST(n_vecs AS DOUBLE) AS mean_scale
FROM agg
"""


# --------------------------------------------- encoding-integrity census
# U+FFFD (the replacement character) is what a lossy transcode leaves
# behind; raw control bytes are what a binary-in-text ingest leaves
# behind. Both are standard pre-training corpus health flags.
_REPL_CHAR = chr(0xFFFD)
# control chars EXCLUDING the whitespace family the tokenizer accepts
# (\t\n\r\f\v); Spark SQL literals process backslash escapes (hence
# \\x), DuckDB's don't (RE2 sees \x.. directly) — same split as
# functions/text.py's whitespace class.
_CTRL_EXPR = r"[\\x00-\\x08\\x0E-\\x1F\\x7F]"
_CTRL_SQL = r"[\x00-\x08\x0e-\x1f\x7f]"


def text_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-integrity census per source: documents carrying
    U+FFFD replacement characters (lossy transcodes), raw control
    bytes (binary contamination), and the non-ASCII character mass —
    the mojibake health check run at ingest, before any
    language-aware step trusts the bytes.

    Shape: narrow per-doc JVM regex flags, one partial-agg shuffle on
    the bounded source key. The single share is one int/int double
    division after aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "source",
        F.expr(f"CAST(contains(text, '{_REPL_CHAR}') AS INT)")
        .alias("has_repl"),
        F.expr(f"CAST(text RLIKE '{_CTRL_EXPR}' AS INT)")
        .alias("has_ctrl"),
        F.expr(r"length(regexp_replace(text, '[\\x00-\\x7F]', ''))")
        .cast("long").alias("non_ascii"),
        F.length("text").cast("long").alias("len"),
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("has_repl").cast("long").alias("docs_replacement"),
        F.sum("has_ctrl").cast("long").alias("docs_control"),
        F.sum("non_ascii").cast("long").alias("non_ascii_chars"),
        F.sum("len").cast("long").alias("total_chars"),
    )
    return agg.select(
        "source", "n_docs", "docs_replacement", "docs_control",
        "non_ascii_chars", "total_chars",
        (F.col("non_ascii_chars").cast("double")
         / F.col("total_chars").cast("double")).alias("non_ascii_share"),
    )


TEXT_INTEGRITY_SQL = rf"""
SELECT source, n_docs, docs_replacement, docs_control, non_ascii_chars,
       total_chars,
       CAST(non_ascii_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
         AS non_ascii_share
FROM (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN contains(text, '{_REPL_CHAR}')
                       THEN 1 ELSE 0 END) AS BIGINT) AS docs_replacement,
         CAST(SUM(CASE WHEN regexp_matches(text, '{_CTRL_SQL}')
                       THEN 1 ELSE 0 END) AS BIGINT) AS docs_control,
         CAST(SUM(length(regexp_replace(text, '[\x00-\x7f]', '', 'g')))
              AS BIGINT) AS non_ascii_chars,
         CAST(SUM(length(text)) AS BIGINT) AS total_chars
  FROM documents
  GROUP BY source
)
"""


# ------------------------------------------------ balanced output shards
# The writer-side op: place docs into N_SHARDS output files with
# near-equal token mass (a skewed shard is a straggler for every
# downstream consumer). Deterministic LPT-flavored round-robin:
# rank docs globally by size, deal rank i to shard i mod N. The
# global rank is NEVER a global window — docs bucket by floor(log2)
# size class (bounded ~40 buckets, integer-exact via binary-string
# length on both engines), rank within bucket (partitioned window),
# and bucket offsets come from a broadcast-sized exclusive prefix sum
# — the same partitioned prefix-sum stitch as orders_backlog.
N_SHARDS = 8
_SHARD_SALTS = 16   # sub-partitions per size class; scale ~ cores
# floor(log2(n+1)) without floating log2 (whose rounding the two
# engines need not share): length of the binary representation - 1
_SIZE_BUCKET_EXPR = "CAST(length(bin(n + 1)) - 1 AS BIGINT)"
_SIZE_BUCKET_SQL = "CAST(length(bin(n + 1)) - 1 AS BIGINT)"


def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus sharding audit: deal every document to one of
    N_SHARDS output shards by size rank (largest classes first,
    round-robin), then report each shard's doc count, token mass, and
    share — the balance check before a 100 TB write fan-out.

    Shape: one scan for token counts; ranks via windows PARTITIONED
    by (log2 size class, doc_id salt) — the salt matters at scale:
    most of a real corpus lands in a handful of size classes, so a
    class-only window would serialize each class onto one task, while
    class x {s} salts caps any window task at ~corpus/(classes*{s})
    rows (raise salts with the cluster). Sub-partition offsets are an
    exclusive prefix sum over the bounded class x salt count table
    (broadcast triangular join); final partial agg onto N_SHARDS
    rows. No global or low-cardinality window anywhere. Within a
    class doc sizes differ by at most 2x, so salted dealing keeps
    the near-equal token balance of the unsalted rank.""".format(
        s=_SHARD_SALTS)
    from pyspark.sql import Window

    from distributed_system_mapreduce_spark.functions.rollups import (
        triangular_cumsum,
    )

    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "doc_id", n_tokens().cast("long").alias("n"),
    ).select(
        "doc_id", "n", F.expr(_SIZE_BUCKET_EXPR).alias("bucket"),
        (F.col("doc_id") % _SHARD_SALTS).alias("salt"),
    )
    # per is consumed by both the class-count table and the ranked
    # deal; without a barrier each consumer replays the scan AND the
    # tokenizer regex over the full corpus (r7 scan audit: 6 scans in
    # the static plan). The checkpoint holds 4 ints/doc — tiny next
    # to re-tokenizing 100 TB of text.
    per = per.transform(cut)
    counts = per.groupBy("bucket", "salt").agg(
        F.count("*").cast("long").alias("cnt"))
    # one integer orders the (bucket DESC, salt ASC) deal sequence, so
    # the shared <=-inclusive prefix helper applies; subtracting the
    # own count makes it exclusive (rank 1 = first doc of the slot)
    ordk = (-F.col("bucket")) * _SHARD_SALTS + F.col("salt")
    offs = (
        triangular_cumsum(
            counts.select(ordk.alias("ok"), "cnt"), "ok", "cnt", "cum")
        .select("ok", (F.col("cum") - F.col("cnt")).alias("offset"))
    )
    w = Window.partitionBy("bucket", "salt").orderBy(
        F.desc("n"), F.asc("doc_id"))
    ranked = (
        per.withColumn("rn", F.row_number().over(w))
        .withColumn("ok", ordk)
        .join(F.broadcast(offs), "ok")
        .select(
            "n",
            ((F.col("offset") + F.col("rn") - 1) % N_SHARDS)
            .cast("long").alias("shard"),
        )
    )
    agg = ranked.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
    ).transform(cut)  # N_SHARDS rows; grand-total + final both read it
    tot = agg.agg(F.sum("total_tokens").cast("long").alias("grand"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "shard", "n_docs", "total_tokens",
            (F.col("total_tokens").cast("double")
             / F.col("grand").cast("double")).alias("token_share"),
        )
    )


SHARD_ASSIGNMENT_SQL = f"""
WITH per AS (
  SELECT doc_id, n, {_SIZE_BUCKET_SQL} AS bucket,
         doc_id % {_SHARD_SALTS} AS salt
  FROM (SELECT doc_id, CAST({N_TOKENS_SQL} AS BIGINT) AS n
        FROM documents)
),
counts AS (
  SELECT bucket, salt, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM per GROUP BY bucket, salt
),
offs AS (
  SELECT bucket, salt,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY bucket DESC, salt ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM counts
),
ranked AS (
  SELECT p.n,
         (o.off + ROW_NUMBER() OVER (PARTITION BY p.bucket, p.salt
                                     ORDER BY p.n DESC, p.doc_id ASC)
          - 1) % {N_SHARDS} AS shard
  FROM per p JOIN offs o
    ON p.bucket = o.bucket AND p.salt = o.salt
),
agg AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS total_tokens
  FROM ranked GROUP BY shard
)
SELECT CAST(shard AS BIGINT) AS shard, n_docs, total_tokens,
       CAST(total_tokens AS DOUBLE)
         / CAST((SELECT SUM(total_tokens) FROM agg) AS DOUBLE)
         AS token_share
FROM agg
"""


# ----------------------------------------------- Gopher-rule gate census
# The classic rule-based quality gate (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", public): hard document filters with
# PER-RULE rejection attribution, so a corpus owner sees WHICH rule
# costs which source how much before turning the gate on. All rule
# comparisons are integer cross-multiplications — no ratio doubles
# inside the predicate, so both engines decide identically.
_GR_MIN_TOKS = 50
_GR_MAX_TOKS = 100_000
_GR_MIN_MWL = 3      # mean word length bounds (chars/token)
_GR_MAX_MWL = 10
_GR_SYMBOL_CLASS_EXPR = r"[#$%&*+=@^_~|<>]"
_GR_SYMBOL_CLASS_SQL = r"[#$%&*+=@^_~|<>]"
_GR_MIN_STOP = 2
# >= 70% of tokens must contain an alphabetic character
_GR_ALPHA_NUM, _GR_ALPHA_DEN = 7, 10


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard-rule gate census per source: for each of the
    five document rules (token-count bounds, mean-word-length bounds,
    symbol-to-token ratio, minimum stopword evidence, alphabetic-token
    share), how many docs fail it, plus the all-rules pass count and
    rate — the rule-attribution report read before enabling the gate.

    Shape: one scan; the token array is materialized ONCE per doc and
    every rule reads it (no re-tokenization per rule — the projection
    chain hazard); one partial-agg shuffle on the bounded source key.
    Rules compare integer cross-products (e.g. 10*symbols < tokens),
    never ratio doubles."""
    from distributed_system_mapreduce_spark.functions.text import (
        STOPWORDS,
        TOKENS_EXPR,
    )

    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "source", F.expr(TOKENS_EXPR).alias("toks"), "text",
    ).select(
        "source",
        F.expr("size(toks)").cast("long").alias("n_toks"),
        F.expr("length(array_join(toks, ''))").cast("long")
        .alias("tok_chars"),
        F.expr(f"size(filter(toks, t -> t IN ({inlist})))").cast("long")
        .alias("n_stop"),
        F.expr("size(filter(toks, t -> t rlike '[A-Za-z]'))")
        .cast("long").alias("n_alpha_toks"),
        F.expr(
            f"length(regexp_replace(text, '[^{_GR_SYMBOL_CLASS_EXPR[1:-1]}]', ''))"
        ).cast("long").alias("n_symbols"),
    )
    f_len = ~F.col("n_toks").between(_GR_MIN_TOKS, _GR_MAX_TOKS)
    f_mwl = (
        (F.col("tok_chars") < _GR_MIN_MWL * F.col("n_toks"))
        | (F.col("tok_chars") > _GR_MAX_MWL * F.col("n_toks"))
    )
    f_sym = 10 * F.col("n_symbols") >= F.col("n_toks")
    f_stop = F.col("n_stop") < _GR_MIN_STOP
    f_alpha = (_GR_ALPHA_DEN * F.col("n_alpha_toks")
               < _GR_ALPHA_NUM * F.col("n_toks"))
    passed = ~(f_len | f_mwl | f_sym | f_stop | f_alpha)
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(f_len.cast("long")).cast("long").alias("fail_length"),
        F.sum(f_mwl.cast("long")).cast("long").alias("fail_word_len"),
        F.sum(f_sym.cast("long")).cast("long").alias("fail_symbols"),
        F.sum(f_stop.cast("long")).cast("long").alias("fail_stopwords"),
        F.sum(f_alpha.cast("long")).cast("long").alias("fail_alpha"),
        F.sum(passed.cast("long")).cast("long").alias("n_pass"),
    )
    return agg.select(
        "source", "n_docs", "fail_length", "fail_word_len",
        "fail_symbols", "fail_stopwords", "fail_alpha", "n_pass",
        (F.col("n_pass").cast("double") / F.col("n_docs").cast("double"))
        .alias("pass_rate"),
    )


def _gopher_rules_sql() -> str:
    from distributed_system_mapreduce_spark.functions.text import (
        STOPWORDS,
        TOKENS_SQL,
    )

    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH per AS (
  SELECT source,
         CAST(len(toks) AS BIGINT) AS n_toks,
         CAST(length(list_aggregate(toks, 'string_agg', '')) AS BIGINT)
           AS tok_chars,
         CAST(len(list_filter(toks, t -> t IN ({inlist}))) AS BIGINT)
           AS n_stop,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
              AS BIGINT) AS n_alpha_toks,
         CAST(length(regexp_replace(text,
              '[^{_GR_SYMBOL_CLASS_SQL[1:-1]}]', '', 'g')) AS BIGINT)
           AS n_symbols
  FROM (SELECT source, {TOKENS_SQL} AS toks, text FROM documents)
),
flags AS (
  SELECT source,
         CAST(n_toks NOT BETWEEN {_GR_MIN_TOKS} AND {_GR_MAX_TOKS}
              AS INT) AS f_len,
         CAST(tok_chars < {_GR_MIN_MWL} * n_toks
              OR tok_chars > {_GR_MAX_MWL} * n_toks AS INT) AS f_mwl,
         CAST(10 * n_symbols >= n_toks AS INT) AS f_sym,
         CAST(n_stop < {_GR_MIN_STOP} AS INT) AS f_stop,
         CAST({_GR_ALPHA_DEN} * n_alpha_toks
              < {_GR_ALPHA_NUM} * n_toks AS INT) AS f_alpha
  FROM per
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_len) AS BIGINT) AS fail_length,
       CAST(SUM(f_mwl) AS BIGINT) AS fail_word_len,
       CAST(SUM(f_sym) AS BIGINT) AS fail_symbols,
       CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
       CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha,
       CAST(SUM(CASE WHEN f_len + f_mwl + f_sym + f_stop + f_alpha = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN f_len + f_mwl + f_sym + f_stop + f_alpha = 0
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS pass_rate
FROM flags
GROUP BY source
"""




# ------------------------------------------------------------ source HHI
def source_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-concentration census: per language, the Herfindahl-
    Hirschman index of source TOKEN shares (sum of squared shares),
    the dominant source, and its share — the one-number answer to
    "is this language's data effectively one crawl?" that decides
    whether domain_mix's rebalancing has anything to work with.

    Exactness: shares are never summed as floats (cross-partition
    double sums are order-nondeterministic). HHI = Σc² / T² computed
    as exact integer Σc² (DECIMAL) and token total T, split into
    quotient + remainder so every operand of the two final double
    divisions fits a double exactly (the events_twap discipline —
    at corpus scale Σc² clears 2^53 where decimal→double casts
    diverge per engine). Shape: one corpus token rollup (partial
    agg), then arithmetic on the bounded (lang, source) table.
    """
    docs = load_table(spark, "documents", sf_dir)
    per = (
        docs.select("lang", "source", n_tokens().alias("nt"))
        .groupBy("lang", "source")
        .agg(F.sum("nt").cast("decimal(38,0)").alias("c"))
    )
    top = F.max(F.struct(F.col("c"), F.col("source")))
    agg = (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.sum("c").cast("bigint").alias("total_tokens"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
            top.alias("t"),
        )
    )
    q = F.expr("CAST(sum_sq DIV total_tokens AS BIGINT)")
    r = F.expr("CAST(sum_sq % total_tokens AS BIGINT)")
    td = F.col("total_tokens").cast("double")
    return agg.select(
        "lang", "n_sources", "total_tokens",
        ((q.cast("double") + r.cast("double") / td) / td).alias("hhi"),
        F.col("t.source").alias("top_source"),
        (F.col("t.c").cast("double") / td).alias("top_share"),
    )


SOURCE_HHI_SQL = f"""
WITH per AS (
  SELECT lang, source, CAST(SUM({N_TOKENS_SQL}) AS DECIMAL(38,0)) AS c
  FROM documents GROUP BY lang, source
),
agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(c) AS BIGINT) AS total_tokens,
         SUM(c * c) AS sum_sq,
         MAX({{'c': c, 'source': source}}) AS t
  FROM per GROUP BY lang
)
SELECT lang, n_sources, total_tokens,
       (CAST(CAST(CAST(sum_sq AS HUGEINT) // total_tokens AS BIGINT)
             AS DOUBLE)
        + CAST(CAST(CAST(sum_sq AS HUGEINT) % total_tokens AS BIGINT)
               AS DOUBLE) / CAST(total_tokens AS DOUBLE))
         / CAST(total_tokens AS DOUBLE) AS hhi,
       t['source'] AS top_source,
       CAST(t['c'] AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS top_share
FROM agg
"""


QUERIES = {
    "source_hhi": source_hhi,
    "tokenizer_fertility": tokenizer_fertility,
    "lang_confusion": lang_confusion,
    "chunk_overlap": chunk_overlap,
    "dedup_cluster_stats": dedup_cluster_stats,
    "embedding_quantize": embedding_quantize,
    "text_integrity": text_integrity,
    "gopher_rules": gopher_rules,
    "shard_assignment": shard_assignment,
}

ORACLES = {
    "source_hhi": SOURCE_HHI_SQL,
    "tokenizer_fertility": TOKENIZER_FERTILITY_SQL,
    "lang_confusion": _lang_confusion_sql(),
    "chunk_overlap": CHUNK_OVERLAP_SQL,
    "dedup_cluster_stats": _dedup_cluster_stats_sql(),
    "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
    "text_integrity": TEXT_INTEGRITY_SQL,
    "gopher_rules": _gopher_rules_sql(),
    "shard_assignment": SHARD_ASSIGNMENT_SQL,
}
