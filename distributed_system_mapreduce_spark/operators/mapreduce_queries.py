"""Reference-parity MapReduce queries, Spark-first.

The reference runs these as maple/juice executables over line files
(see /root/reference/mj_exe/ and command_backup). Here each job is a
declarative DataFrame plan — the map phase becomes generate/project
expressions, the shuffle becomes Catalyst's hash exchange, and the
reduce phase becomes a (partial-aggregating) groupBy. The generic
imperative API lives in engine/maple_juice.py; these are the
Spark-native ports of the shipped example jobs.

Jobs ported:
- wordcount       (ref: mj_exe/wc_maple + mj_exe/juice_wordcount.go:11-30)
- vote pipeline   (ref: mj_exe/maple_vote.go:10-40 -> juice_vote.go:10-45
                   -> maple_vote_two.go -> juice_vote_two.go:10-38)
- split_by_key    (ref: mj_exe/splitKey.go — partition rows by key)
- range partition (ref: maple_juice.go:688 Shuffle(partition="range"))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut


# ---------------------------------------------------------------- wordcount

def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace wordcount over documents.text.

    Reference semantics: bufio.ScanWords (split on whitespace, no case
    folding), then per-key count (juice_wordcount.go:24 wcmap[key]+=count).
    Spark plan: split/explode stay in whole-stage codegen; groupBy count
    does a map-side partial aggregate before the single hash shuffle.
    """
    docs = load_table(spark, "documents", sf_dir)
    # explicit whitespace class (not \s): Java counts \x0B as \s,
    # RE2 doesn't — see functions/text.py
    return (
        docs.select(F.explode(
            F.split(F.col("text"), r"[ \t\n\r\f\x0B]+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


WORDCOUNT_SQL = r"""
SELECT word, count(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(text, '[ \t\n\r\f\v]+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""


# ------------------------------------------------------------ vote pipeline
# Ballots: each event contributes one 3-candidate preference order over
# (A, B, C), derived deterministically from event_id so the Spark query
# and the SQL oracle agree: perm = (event_id % 7) % 6 (slight bias to
# perm 0 so the election has a clear winner). This stands in for the
# reference's vote_input file of "c1 c2 c3" ballot lines.

_PERMS = ["ABC", "ACB", "BAC", "BCA", "CAB", "CBA"]


def _ballots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("event_id")
    perm = (F.col("event_id") % 7) % 6
    choices = [F.lit(p) for p in _PERMS]
    ballot = F.element_at(F.array(*choices), (perm + 1).cast("int"))
    return ev.select(
        F.substring(ballot, 1, 1).alias("c1"),
        F.substring(ballot, 2, 1).alias("c2"),
        F.substring(ballot, 3, 1).alias("c3"),
    )


_BALLOTS_SQL = """
  SELECT substr(ballot, 1, 1) AS c1, substr(ballot, 2, 1) AS c2,
         substr(ballot, 3, 1) AS c3
  FROM (
    SELECT list_value('ABC','ACB','BAC','BCA','CAB','CBA')
           [CAST((event_id % 7) % 6 AS INT) + 1] AS ballot
    FROM events
  )
"""


def vote_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 1: pairwise-preference majority per candidate pair.

    maple_vote.go:20-39 emits, for each ballot and each of the 3
    unordered pairs, key "min,max" with value 1 iff the ballot prefers
    the lexicographically smaller candidate; juice_vote.go decides the
    pair by majority (ties -> the larger candidate, matching the Go
    `numOne > numZero` test). One explode + one partial-agg shuffle.
    """
    b = _ballots(spark, sf_dir)
    pairs = b.select(
        F.explode(
            F.array(
                # pair (c1,c2): ballot prefers c1
                F.struct(
                    F.least("c1", "c2").alias("small"),
                    F.greatest("c1", "c2").alias("big"),
                    (F.col("c1") < F.col("c2")).cast("long").alias("pref_small"),
                ),
                # pair (c2,c3): ballot prefers c2
                F.struct(
                    F.least("c2", "c3").alias("small"),
                    F.greatest("c2", "c3").alias("big"),
                    (F.col("c2") < F.col("c3")).cast("long").alias("pref_small"),
                ),
                # pair (c1,c3): ballot prefers c1
                F.struct(
                    F.least("c1", "c3").alias("small"),
                    F.greatest("c1", "c3").alias("big"),
                    (F.col("c1") < F.col("c3")).cast("long").alias("pref_small"),
                ),
            )
        ).alias("p")
    ).select("p.small", "p.big", "p.pref_small")
    return (
        pairs.groupBy("small", "big")
        .agg(
            F.sum("pref_small").alias("wins_small"),
            (F.count("*") - F.sum("pref_small")).alias("wins_big"),
        )
        .select(
            F.concat_ws(",", "small", "big").alias("pair"),
            "wins_small",
            "wins_big",
            F.when(F.col("wins_small") > F.col("wins_big"), F.col("small"))
            .otherwise(F.col("big"))
            .alias("winner"),
        )
    )


VOTE_ROUND1_SQL = f"""
SELECT small || ',' || big AS pair,
       wins_small, wins_big,
       CASE WHEN wins_small > wins_big THEN small ELSE big END AS winner
FROM (
  SELECT small, big,
         CAST(SUM(pref_small) AS BIGINT) AS wins_small,
         CAST(COUNT(*) - SUM(pref_small) AS BIGINT) AS wins_big
  FROM (
    SELECT least(c1, c2) AS small, greatest(c1, c2) AS big,
           CASE WHEN c1 < c2 THEN 1 ELSE 0 END AS pref_small
    FROM ({_BALLOTS_SQL})
    UNION ALL
    SELECT least(c2, c3), greatest(c2, c3),
           CASE WHEN c2 < c3 THEN 1 ELSE 0 END
    FROM ({_BALLOTS_SQL})
    UNION ALL
    SELECT least(c1, c3), greatest(c1, c3),
           CASE WHEN c1 < c3 THEN 1 ELSE 0 END
    FROM ({_BALLOTS_SQL})
  )
  GROUP BY small, big
)
"""


def vote_winner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 2: Copeland winner — candidate with most pairwise wins.

    maple_vote_two.go re-keys every pair-result under one key;
    juice_vote_two.go:20-27 counts wins per candidate and prints the
    argmax. We keep (winner, wins) and take the top row with a
    deterministic tie-break on candidate name.
    """
    r1 = vote_round1(spark, sf_dir)
    return (
        r1.groupBy(F.col("winner").alias("candidate"))
        .agg(F.count("*").alias("pair_wins"))
        .orderBy(F.desc("pair_wins"), F.asc("candidate"))
        .limit(1)
    )


VOTE_WINNER_SQL = f"""
SELECT winner AS candidate, COUNT(*) AS pair_wins
FROM ({VOTE_ROUND1_SQL})
GROUP BY winner
ORDER BY pair_wins DESC, candidate ASC
LIMIT 1
"""


# ------------------------------------------------------------ split_by_key
def split_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """splitKey.go parity: bucket rows by key, report per-key volumes.

    The reference writes one SDFS file per distinct key
    (splitMapleResultFile, maple_juice.go:266-310). At scale that is a
    metadata explosion; the Spark-native equivalent is a partitioned
    write (df.write.partitionBy(key)) — the accounting query below is
    what `store`/`ls` would then show per key.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SPLIT_BY_KEY_SQL = """
SELECT event_type AS key, COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def range_partition_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle(partition="range") parity (maple_juice.go:688-709).

    The reference sorts keys and deals contiguous key ranges to N
    workers. The observable semantics — contiguous, ordered, balanced
    buckets — are an exact ntile(4) histogram over user_id, computed
    WITHOUT a global single-partition window (ntile over
    Window.orderBy would move every row to one task — non-viable at
    scale). Distributed exact-ntile via partitioned prefix sums:

      1. per-key counts (one shuffle; cardinality = distinct keys)
      2. repartitionByRange on key; localCheckpoint pins partition ids
      3. per-partition totals -> O(#partitions) rows to the driver ->
         broadcast cumulative offsets
      4. within-partition cumsum window + offset = each key's global
         row-position range [cum-cnt+1, cum]
      5. broadcast-join the 4 bucket boundary rows, overlap arithmetic
         gives per-(key, bucket) row counts -> groupBy bucket

    Ties are no issue: any user_id-sorted order places equal keys
    contiguously, so the per-bucket count/min/max are tie-invariant.
    """
    ev = load_table(spark, "events", sf_dir).select("user_id")
    keys = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    # localCheckpoint (eager) pins spark_partition_id: the range
    # exchange samples boundaries, so two lazy recomputations could
    # disagree on pid assignment between steps 3 and 4.
    kr = (
        keys.repartitionByRange(32, "user_id")
        .withColumn("pid", F.spark_partition_id())
        .transform(cut)
    )
    ptots = {
        r["pid"]: r["tot"]
        for r in kr.groupBy("pid").agg(F.sum("cnt").alias("tot")).collect()
    }
    offsets, run = [], 0
    for pid in sorted(ptots):
        offsets.append((pid, run))
        run += ptots[pid]
    n = run
    q, r = divmod(n, 4)
    bounds, start = [], 1
    for b in range(1, 5):
        size = q + (1 if b <= r else 0)
        bounds.append((b, start, start + size - 1))
        start += size
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, off long")
    bdf = spark.createDataFrame(bounds, "bucket int, bstart long, bend long")

    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("user_id")
    cum = (
        kr.withColumn("cum_in", F.sum("cnt").over(w))
        .join(F.broadcast(off_df), "pid")
        .select("user_id", "cnt",
                (F.col("cum_in") + F.col("off")).alias("cum"))
    )
    overlap = (
        F.least(F.col("bend"), F.col("cum"))
        - F.greatest(F.col("bstart"), F.col("cum") - F.col("cnt") + 1)
        + 1
    )
    return (
        cum.join(
            F.broadcast(bdf),
            (F.col("cum") - F.col("cnt") + 1 <= F.col("bend"))
            & (F.col("cum") >= F.col("bstart")),
        )
        .groupBy("bucket")
        .agg(
            F.sum(overlap).alias("n_rows"),
            F.min("user_id").alias("min_key"),
            F.max("user_id").alias("max_key"),
        )
    )


RANGE_PARTITION_HIST_SQL = """
SELECT bucket, COUNT(*) AS n_rows, MIN(user_id) AS min_key,
       MAX(user_id) AS max_key
FROM (
  SELECT user_id, ntile(4) OVER (ORDER BY user_id) AS bucket
  FROM events
)
GROUP BY bucket
"""


QUERIES = {
    "wordcount": wordcount,
    "vote_round1": vote_round1,
    "vote_winner": vote_winner,
    "split_by_key": split_by_key,
    "range_partition_hist": range_partition_hist,
}

ORACLES = {
    "wordcount": WORDCOUNT_SQL,
    "vote_round1": VOTE_ROUND1_SQL,
    "vote_winner": VOTE_WINNER_SQL,
    "split_by_key": SPLIT_BY_KEY_SQL,
    "range_partition_hist": RANGE_PARTITION_HIST_SQL,
}


# ------------------------------------------------------- contact tracing
# Reference parity: the mj_exe contact pipeline (contact_maple1.go ->
# contact_maple2.go -> contact_maple3.go -> contact_juice3.go) tags a
# positive set, reshapes (person, location, start, end) visit lines,
# and emits people whose visit interval overlaps a positive's at the
# same location. The reference's juice stage is an unfinished
# in-memory scan; this is the Spark-first formulation of the same
# semantics: visits = events (location := event_type, interval :=
# [ts, ts + value seconds]); positives = user_id % 5 == 0.
CONTACT_POS_MOD = 5
CONTACT_BASE_S = 1800  # visit dwell baseline; + value seconds jitter
CONTACT_BUCKET_S = 3600  # hour buckets; dwell <= ~40 min spans <= 2


def mr_contact_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per exposed (non-positive) user: how many distinct positive
    users their visits overlapped at the same location, the number of
    overlapping visit pairs, and the earliest overlap instant.

    Scale shape: the interval-overlap join is BUCKETIZED (the
    purchase_attribution discipline) — each visit explodes into the
    <= 2 hour buckets it covers, the join is an equi-join on
    (location, bucket) with the exact overlap predicate re-checked,
    and a distinct collapses the double-bucket matches. Never an
    unbounded inequality join. All times are exact epoch-second
    BIGINTs (the DuckDB oracle needs no bucket trick at its scale —
    an independent O(n^2)-join formulation of the same semantics)."""
    ev = load_table(spark, "events", sf_dir)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    visits = ev.select(
        "user_id",
        F.col("event_type").alias("loc"),
        ts_s.alias("s"),
        # visit dwell = 30 min baseline + value-seconds jitter.
        # floor(), not a bare cast: Spark's double->long truncates
        # where DuckDB's CAST rounds half-even (verify-skill gotcha)
        (ts_s + F.lit(CONTACT_BASE_S)
         + F.floor(F.col("value")).cast("long")).alias("e"),
    )
    pos = visits.filter(F.col("user_id") % CONTACT_POS_MOD == 0)
    exposed = visits.filter(F.col("user_id") % CONTACT_POS_MOD != 0)

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col("user_id").alias(f"{prefix}u"),
            F.col("loc").alias(f"{prefix}loc"),
            F.col("s").alias(f"{prefix}s"),
            F.col("e").alias(f"{prefix}e"),
            F.explode(F.expr(
                f"sequence(s DIV {CONTACT_BUCKET_S}, "
                f"e DIV {CONTACT_BUCKET_S})")).alias(f"{prefix}b"),
        )
    p, c = bucketed(pos, "p"), bucketed(exposed, "c")
    pairs = (
        c.join(p, (F.col("cloc") == F.col("ploc"))
               & (F.col("cb") == F.col("pb"))
               & (F.col("ps") <= F.col("ce"))
               & (F.col("cs") <= F.col("pe")))
        .select("cu", "pu", "cs", "ps",
                F.greatest("cs", "ps").alias("ov"))
        .distinct()  # collapse double-bucket matches
    )
    return pairs.groupBy(F.col("cu").alias("user_id")).agg(
        F.countDistinct("pu").cast("long").alias("n_pos_contacts"),
        F.count(F.lit(1)).cast("long").alias("n_overlap_visits"),
        F.min("ov").cast("long").alias("first_overlap_s"),
    )


MR_CONTACT_TRACE_SQL = f"""
WITH visits AS (
  SELECT user_id, event_type AS loc,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + {CONTACT_BASE_S}
           + CAST(floor(value) AS BIGINT) AS e
  FROM events
),
pairs AS (
  SELECT DISTINCT c.user_id AS cu, p.user_id AS pu, c.s AS cs,
         p.s AS ps, greatest(c.s, p.s) AS ov
  FROM visits c JOIN visits p
    ON c.loc = p.loc
   AND p.user_id % {CONTACT_POS_MOD} = 0
   AND c.user_id % {CONTACT_POS_MOD} <> 0
   AND p.s <= c.e AND c.s <= p.e
)
SELECT cu AS user_id,
       CAST(COUNT(DISTINCT pu) AS BIGINT) AS n_pos_contacts,
       CAST(COUNT(*) AS BIGINT) AS n_overlap_visits,
       CAST(MIN(ov) AS BIGINT) AS first_overlap_s
FROM pairs
GROUP BY cu
"""

QUERIES["mr_contact_trace"] = mr_contact_trace
ORACLES["mr_contact_trace"] = MR_CONTACT_TRACE_SQL
