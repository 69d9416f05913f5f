"""Deterministically-seeded probabilistic structures, oracle-checked.

Unlike the sketch family in sketches.py (HLL / Misra-Gries /
approx-quantile — estimates that depend on partitioning, so
rows-only), these two are pure functions of the data: every hash is
md5, every keep/probe decision is integer arithmetic on the hex
digits, so DuckDB replicates them bit-for-bit and the driver's value
hash applies.

- kmv_distinct      : K-minimum-values distinct-cardinality sketch
                      per source (Bar-Yossef et al. 2002; the
                      bottom-k estimator d_hat = (K-1)/h_(K)).
- bloom_semi_filter : Bloom-filter runtime pre-filter for a
                      fact-side semi join (the Spark/Trino
                      "runtime filter" / bloom-pruned scan pattern),
                      with the exact semi join run alongside to
                      account true/false positives.

Reference parity: the reference has no sketch layer; these extend
the MapleJuice surface the way its wordcount-style jobs would need
at corpus scale (SURVEY §2.D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

# --------------------------------------------------------------- kmv
KMV_K = 64          # bottom-k size: RSE ~ 1/sqrt(K-2) ~ 12.7%
KMV_SALTS = 64      # phase-1 fan-out (see kmv_distinct docstring)
_POW52 = float(1 << 52)  # 13 hex nibbles; exactly representable


def _hex_long(hex_col: str, n: int) -> str:
    """DuckDB: integer value of the first `n` hex chars of an md5-hex
    expression — nibble decode via instr (DuckDB has no conv()).
    Valid for n <= 15 (fits a BIGINT)."""
    parts = [
        f"(instr('0123456789abcdef', substring({hex_col}, {i + 1}, 1))"
        f" - 1) * CAST({16 ** (n - 1 - i)} AS BIGINT)"
        for i in range(n)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def _hex_conv(hex_expr: str, n: int) -> str:
    """Spark: same value via the codegen'd conv() scalar — ONE
    evaluation of the md5 argument per reference, so it needs no
    lambda-binding games to stay cheap (the nibble-decode form
    re-evaluates the digest per nibble after projection collapse;
    measured 20x slower on the probe path)."""
    return (f"CAST(conv(substring({hex_expr}, 1, {n}), 16, 10)"
            f" AS BIGINT)")


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle cardinality via the K-minimum-
    values sketch: hash every distinct (source, shingle) to a uniform
    52-bit value, keep each source's K smallest, estimate
    d_hat = (K-1) / (h_(K) / 2^52).

    Scale shape — bottom-K without a per-source sort of the full
    hash stream: phase 1 ranks within (source, h % SALTS) partitions
    and keeps K per salt (the global bottom-K is a subset of the
    per-salt bottom-Ks, since any global member is also among its own
    salt's K smallest); phase 2 ranks the <= SALTS*K survivors per
    source. A plain per-source window would serialize each source's
    entire distinct-hash stream through one task at 100 TB; the
    salted two phases keep every partition bounded. The oracle uses
    the plain single-window form — provably the same K rows.

    The estimator is two double ops on exactly-representable
    integers (h < 2^52), so est_distinct hash-matches cross-engine.
    Accuracy (vs the exact distinct it estimates) is bounded in
    tests/test_sketches.py."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select("source", X.tokens().alias("toks"))
    sh = toks.select(
        "source",
        F.explode(F.array_distinct(F.expr(X.shingles_from("toks"))))
        .alias("s"),
    ).distinct()
    hashed = sh.select(
        "source", "s",
        F.expr(_hex_conv("md5(s)", 13)).alias("h"),
    )
    w1 = Window.partitionBy(
        "source", F.pmod(F.col("h"), F.lit(KMV_SALTS))
    ).orderBy("h", "s")
    phase1 = (
        hashed.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K).drop("rn")
    )
    w2 = Window.partitionBy("source").orderBy("h", "s")
    kept = (
        phase1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
    )
    kth = F.max("h")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            kth.alias("kth_hash"),
            F.when(
                F.count(F.lit(1)) < KMV_K,
                F.count(F.lit(1)).cast("double"),
            ).otherwise(
                F.lit(float(KMV_K - 1))
                / (kth.cast("double") / F.lit(_POW52))
            ).alias("est_distinct"),
        )
    )


_KMV_HASHED_SQL = f"""
  SELECT source, s, {_hex_long("hx", 13)} AS h
  FROM (SELECT DISTINCT source, s, md5(s) AS hx
        FROM (SELECT source, unnest({X.SHINGLES_SQL}) AS s
              FROM documents))
"""

KMV_DISTINCT_SQL = f"""
WITH kept AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, s) AS rn
    FROM ({_KMV_HASHED_SQL})
  ) WHERE rn <= {KMV_K}
)
SELECT source, COUNT(*) AS n_kept, MAX(h) AS kth_hash,
       CASE WHEN COUNT(*) < {KMV_K}
            THEN CAST(COUNT(*) AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE)
                 / (CAST(MAX(h) AS DOUBLE) / {_POW52!r})
       END AS est_distinct
FROM kept
GROUP BY source
"""


# ------------------------------------------------------------- bloom
BLOOM_WORDS = 512    # 512 x 32-bit words = 16384 bits
BLOOM_BITS = BLOOM_WORDS * 32
BLOOM_HASHES = 3     # k probes per key
_SEGMENT = "BUILDING"


def _pos_expr(j: int, key: str) -> str:
    """Spark: bit position j for `key` — all scalar codegen'd
    expressions (md5 -> conv -> pmod), no HOF interpretation."""
    hx = f"md5(concat('{j}:', CAST({key} AS STRING)))"
    return f"pmod({_hex_conv(hx, 13)}, {BLOOM_BITS})"


def _positions_sql(key: str) -> str:
    mk = (f"list_transform(range(0, {BLOOM_HASHES}), "
          f"j -> md5(CAST(j AS VARCHAR) || ':' || "
          f"CAST({key} AS VARCHAR)))")
    return (f"list_transform({mk}, hx -> "
            f"({_hex_long('hx', 13)} % {BLOOM_BITS}))")


def bloom_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom filter for a semi join, accounted: build a
    16384-bit / 3-hash filter over the BUILDING-segment customer
    keys, probe every order against it, and cross-check the
    survivors with the exact semi join. Output: one row of
    (n_orders, bloom_pass, true_match, false_pos, fp_rate).

    This is the join-pruning pattern that matters at 100 TB: the
    filter is a constant-size aggregate of the (small) dim side —
    built with a map-side-combined bit_or shuffle of BLOOM_WORDS
    rows — broadcast into the fact scan, so non-matching fact rows
    die in a narrow filter BEFORE the join shuffle moves them. The
    exact semi join here runs over the survivors only (that is the
    point); the unfiltered fact never shuffles. Bloom guarantees no
    false negatives — asserted cross-engine by construction
    (true_match equals the plain semi-join count, tested) — and the
    fp accounting measures the bits/key budget (~54 bits/key at
    sf0.01, ~5.6 at sf0.1; size BLOOM_BITS ~ 10-20 bits/key on a
    real dim).

    All BLOOM_HASHES probe positions come from md5 nibble
    arithmetic, so DuckDB builds the identical bitset and the row
    hash-matches."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    keys = cust.filter(F.col("c_mktsegment") == _SEGMENT).select(
        F.col("c_custkey").alias("k")).distinct()
    # bit positions per key -> bit_or per word -> ONE dense word array
    bits = keys.select(
        F.explode(F.array(*[
            F.expr(_pos_expr(j, "k")) for j in range(BLOOM_HASHES)
        ])).alias("pos")
    ).select(
        F.expr("CAST(pos DIV 32 AS INT)").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
        .alias("mask"),
    )
    words = bits.groupBy("word").agg(F.bit_or("mask").alias("mask"))
    dense = (
        spark.range(BLOOM_WORDS).select(F.col("id").cast("int")
                                        .alias("word"))
        .join(words, "word", "left")
        .agg(F.array_sort(F.collect_list(F.struct(
            "word", F.coalesce("mask", F.lit(0).cast("bigint"))
            .alias("mask")))).alias("wm"))
        .select(F.expr("transform(wm, x -> x.mask)").alias("ms"))
    )
    # probe: every position's bit set in the dense word array —
    # element_at is O(1); each probe's md5+conv evaluates twice
    # (word ref + bit ref), all inside WholeStageCodegen
    pass_expr = " AND ".join(
        f"((element_at(ms, CAST(({p}) DIV 32 AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 32 AS INT))) <> 0)"
        for p in (_pos_expr(j, "o_custkey")
                  for j in range(BLOOM_HASHES))
    )
    probed = (
        orders.select("o_custkey")
        .crossJoin(F.broadcast(dense))
        .withColumn("bloom_pass", F.expr(pass_expr))
    )
    truth = (
        probed.filter("bloom_pass")
        .join(F.broadcast(keys),
              F.col("o_custkey") == F.col("k"), "left")
        .select("bloom_pass", F.col("k").isNotNull().alias("hit"))
    )
    n_all = orders.select(F.count(F.lit(1)).alias("n_orders"))
    agg = truth.agg(
        F.count(F.lit(1)).alias("bloom_pass"),
        F.sum(F.col("hit").cast("long")).cast("bigint")
        .alias("true_match"),
        F.sum((~F.col("hit")).cast("long")).cast("bigint")
        .alias("false_pos"),
    )
    return (
        n_all.crossJoin(F.broadcast(agg))
        .select(
            "n_orders", "bloom_pass", "true_match", "false_pos",
            (F.col("false_pos").cast("double")
             / F.col("bloom_pass").cast("double")).alias("fp_rate"),
        )
    )


def _bloom_sql() -> str:
    pass_sql = (
        f"list_aggregate(list_transform({_positions_sql('o_custkey')}, "
        f"p -> CASE WHEN (ms[CAST(p // 32 AS INT) + 1] & "
        f"(CAST(1 AS BIGINT) << CAST(p % 32 AS INT))) <> 0 "
        f"THEN 1 ELSE 0 END), 'min') = 1"
    )
    return f"""
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer
  WHERE c_mktsegment = '{_SEGMENT}'
),
bits AS (
  SELECT CAST(pos // 32 AS INT) AS word,
         (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS mask
  FROM (SELECT unnest({_positions_sql('k')}) AS pos FROM keys)
),
words AS (
  SELECT word, BIT_OR(mask) AS mask FROM bits GROUP BY word
),
blm AS (
  SELECT LIST(COALESCE(w.mask, 0) ORDER BY r.range) AS ms
  FROM range(0, {BLOOM_WORDS}) r
  LEFT JOIN words w ON w.word = r.range
),
probed AS (
  SELECT o_custkey, ({pass_sql}) AS bloom_pass
  FROM orders CROSS JOIN blm
),
truth AS (
  SELECT p.bloom_pass, (k.k IS NOT NULL) AS hit
  FROM (SELECT * FROM probed WHERE bloom_pass) p
  LEFT JOIN keys k ON p.o_custkey = k.k
)
SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
       COUNT(*) AS bloom_pass,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         AS true_match,
       CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT)
         AS false_pos,
       CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS fp_rate
FROM truth
"""


BLOOM_SEMI_FILTER_SQL = _bloom_sql()


QUERIES = {
    "kmv_distinct": kmv_distinct,
    "bloom_semi_filter": bloom_semi_filter,
}

ORACLES = {
    "kmv_distinct": KMV_DISTINCT_SQL,
    "bloom_semi_filter": BLOOM_SEMI_FILTER_SQL,
}




# --------------------------------------------------------- kmv_set_ops
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA over event-type audiences: for every type
    pair (a < b), union / intersection / Jaccard ESTIMATES from the
    two types' K-minimum-values user sketches — the theta-sketch
    workflow (merge bottom-Ks, count shared members in the merged
    head) that answers cross-audience questions from kilobyte
    summaries instead of re-scanning either audience. The sketch
    twin of the exact audience_overlap.

    Math per pair: X = bottom-K of S_a union S_b (same user -> same
    hash; dedup by h with membership flags); |AuB| ~
    (K-1)/(max(X)/2^52), exact |X| when under K; J ~ |{h in X in
    BOTH sketches}| / |X|; |AnB| = J * |AuB|. Every step is a pure
    function of md5, so both engines build the identical sketches
    and identical estimates — hash-checkable despite approximate.

    Scale shape: corpus-scale work is ONE distinct (type, user) pass
    + the salted two-phase bottom-K (kmv_distinct's discipline);
    everything downstream runs on the bounded |types| x K sketch
    table (the partner-type inequality join is a broadcast nested
    loop over that tiny table — the triangular-broadcast idiom, not
    a data-scale cartesian). Accuracy vs the exact audience_overlap
    is bounded in tests/test_sketches.py."""
    ev = spread(load_table(spark, "events", sf_dir))
    hashed = (
        ev.select("event_type", "user_id").distinct()
        .select("event_type",
                F.expr(_hex_conv("md5(CAST(user_id AS STRING))", 13))
                .alias("h"))
    )
    w1 = Window.partitionBy(
        "event_type", F.pmod(F.col("h"), F.lit(KMV_SALTS))
    ).orderBy("h")
    phase1 = (hashed.withColumn("rn", F.row_number().over(w1))
              .filter(F.col("rn") <= KMV_K).drop("rn"))
    w2 = Window.partitionBy("event_type").orderBy("h")
    sk = (phase1.withColumn("rn", F.row_number().over(w2))
          .filter(F.col("rn") <= KMV_K).drop("rn")
          .transform(cut))  # bounded |types| x K rows; read 3x below
    types = sk.select("event_type").distinct()
    a_side = (
        sk.select(F.col("event_type").alias("ta"), "h")
        .join(F.broadcast(types.select(F.col("event_type").alias("tb"))),
              F.col("tb") > F.col("ta"))
        .select("ta", "tb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    )
    b_side = (
        sk.select(F.col("event_type").alias("tb"), "h")
        .join(F.broadcast(types.select(F.col("event_type").alias("ta"))),
              F.col("tb") > F.col("ta"))
        .select("ta", "tb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    )
    mem = (a_side.unionByName(b_side)
           .groupBy("ta", "tb", "h")
           .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib")))
    wp = Window.partitionBy("ta", "tb").orderBy("h")
    x = (mem.withColumn("rn", F.row_number().over(wp))
         .filter(F.col("rn") <= KMV_K))
    agg = x.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n_x"),
        F.max("h").alias("kth"),
        F.sum((F.col("ia") * F.col("ib"))).alias("n_both"),
    )
    est_union = F.when(
        F.col("n_x") < KMV_K, F.col("n_x").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("kth").cast("double")
                                   / F.lit(_POW52)))
    return agg.select(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
        F.col("n_x").cast("long").alias("n_merged"),
        F.col("n_both").cast("long").alias("n_shared"),
        est_union.alias("est_union"),
        (F.col("n_both").cast("double") / F.col("n_x").cast("double"))
        .alias("est_jaccard"),
        ((F.col("n_both").cast("double") / F.col("n_x").cast("double"))
         * est_union).alias("est_intersection"),
    )


KMV_SET_OPS_SQL = f"""
WITH hashed AS (
  SELECT event_type, {_hex_long("hx", 13)} AS h
  FROM (SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        FROM events)
),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM sk),
mem AS (
  SELECT ta, tb, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
    SELECT a.event_type AS ta, t.event_type AS tb, a.h,
           1 AS ia, 0 AS ib
    FROM sk a JOIN types t ON t.event_type > a.event_type
    UNION ALL
    SELECT t.event_type AS ta, b.event_type AS tb, b.h,
           0 AS ia, 1 AS ib
    FROM sk b JOIN types t ON t.event_type < b.event_type
  ) GROUP BY ta, tb, h
),
x AS (
  SELECT * FROM (
    SELECT ta, tb, h, ia, ib,
           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
    FROM mem
  ) WHERE rn <= {KMV_K}
),
agg AS (
  SELECT ta, tb, COUNT(*) AS n_x, MAX(h) AS kth,
         SUM(ia * ib) AS n_both
  FROM x GROUP BY ta, tb
)
SELECT ta AS type_a, tb AS type_b,
       CAST(n_x AS BIGINT) AS n_merged,
       CAST(n_both AS BIGINT) AS n_shared,
       CASE WHEN n_x < {KMV_K} THEN CAST(n_x AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE)
                 / (CAST(kth AS DOUBLE) / {_POW52!r})
       END AS est_union,
       CAST(n_both AS DOUBLE) / CAST(n_x AS DOUBLE) AS est_jaccard,
       (CAST(n_both AS DOUBLE) / CAST(n_x AS DOUBLE))
         * (CASE WHEN n_x < {KMV_K} THEN CAST(n_x AS DOUBLE)
                 ELSE CAST({KMV_K - 1} AS DOUBLE)
                      / (CAST(kth AS DOUBLE) / {_POW52!r})
            END) AS est_intersection
FROM agg
"""

QUERIES["kmv_set_ops"] = kmv_set_ops
ORACLES["kmv_set_ops"] = KMV_SET_OPS_SQL
