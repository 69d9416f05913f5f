"""Relational wave 19: robust statistics and audience analysis.

- events_mad_outliers : median/MAD robust outlier census per event
                        type — the z-score (events_anomaly) sibling
                        that a heavy-tailed value column needs, since
                        mean and stddev are themselves dragged by the
                        outliers they are supposed to flag.
- audience_overlap    : pairwise audience intersection / Jaccard
                        between event types — 'do purchasers also
                        click' set algebra computed without a
                        user-level self-join.

Reference parity: maple+juice compositions in the reference's model
(/root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut

MAD_K = 3.0  # flag |value - median| > MAD_K * 1.4826 * MAD


# ------------------------------------------------------ events_mad_outliers
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median, MAD (median
    absolute deviation), and how many events sit beyond
    MAD_K * 1.4826 * MAD of the median (1.4826 scales MAD to sigma
    under normality, so the threshold reads like a 3-sigma rule that
    outliers cannot corrupt).

    Exactness: both medians use the exact interpolating percentile
    (Spark percentile == DuckDB quantile_cont bit-for-bit, the
    price_quantiles precedent); |value - median| and the threshold
    compare are per-row fixed-order double ops; the flag count is an
    exact BIGINT. Shape: two aggregation passes over events (median,
    then deviation median + count) with the per-type medians riding a
    broadcast join — bounded type cardinality keeps the exact
    per-group sort safe; unbounded groups would switch to
    approx_percentile."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = F.broadcast(
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("median")))
    dev = ev.join(med, "event_type").select(
        "event_type", "median",
        F.abs(F.col("value") - F.col("median")).alias("adev"))
    mads = F.broadcast(
        dev.groupBy("event_type")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad")))
    return (
        dev.join(mads, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
            F.sum(
                (F.col("adev")
                 > F.lit(MAD_K) * F.lit(1.4826) * F.col("mad"))
                .cast("long")).cast("long").alias("n_outliers"),
        )
    )


EVENTS_MAD_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, m.median, abs(e.value - m.median) AS adev
  FROM events e JOIN med m USING (event_type)
),
mads AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(median) AS median, MIN(mad) AS mad,
       CAST(SUM(CASE WHEN adev > {MAD_K} * 1.4826 * mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mads USING (event_type)
GROUP BY event_type
"""


# --------------------------------------------------------- audience_overlap
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: for every type
    pair (a < b), how many distinct users did BOTH, each type's
    audience size, and the Jaccard overlap — the cross-sell /
    cannibalization readout.

    Shape: ONE shuffle to per-user sorted type sets
    (localCheckpointed — the pair expansion and the audience-size
    rollup both reference it and each replayed the events scan
    otherwise; r7 scan audit: 3 scans, now 1), then pairs expand
    IN-ARRAY (bounded by the handful of types a user can have — the
    graphs.py co-purchase idiom, never a distinct x distinct
    self-join whose hot types would explode); per-type audience
    sizes come off the same set table and ride a broadcast join.
    Jaccard is one fixed-order double division over exact BIGINTs."""
    ev = load_table(spark, "events", sf_dir)
    sets = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
        .transform(cut)
    )
    pairs = (
        sets.select(F.explode(F.expr(
            "flatten(transform(types, (a, i) -> "
            "transform(slice(types, i + 2, size(types)), "
            "b -> struct(a AS ta, b AS tb))))")).alias("p"))
        .groupBy(F.col("p.ta").alias("type_a"),
                 F.col("p.tb").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    aud = F.broadcast(
        sets.select(F.explode("types").alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (
        pairs
        .join(aud.select(F.col("t").alias("type_a"),
                         F.col("n").alias("n_a")), "type_a")
        .join(aud.select(F.col("t").alias("type_b"),
                         F.col("n").alias("n_b")), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            (F.col("n_both").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
             .cast("double")).alias("jaccard"),
        )
    )


AUDIENCE_OVERLAP_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
aud AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, aa.n AS n_a, ab.n AS n_b, n_both,
       CAST(n_both AS DOUBLE)
         / CAST(aa.n + ab.n - n_both AS DOUBLE) AS jaccard
FROM pairs
JOIN aud aa ON aa.event_type = type_a
JOIN aud ab ON ab.event_type = type_b
"""


THROTTLE_GAP_S = 60
_NEG_SENTINEL = -(1 << 62)


# ------------------------------------------------------------ events_throttle
def events_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rate-limit ledger: replay each user's event stream in
    (ts, event_id) order keeping an event only if it lands >=
    THROTTLE_GAP_S after the last KEPT one — the ingest-throttling /
    notification-dedup primitive whose keep decision depends on prior
    keep decisions, so no window function expresses it.

    Shape: ONE shuffle to per-user sorted arrays (bounded by a user's
    own activity), then a strict left fold with a (n_kept, last_kept)
    struct accumulator — linear, JVM-side, no Python. Exactness: pure
    integer micro-timestamps. The DuckDB twin is the same fold via
    list_reduce; the accumulator fields are ordered (n, last) so the
    n-expression reads only the not-yet-updated last field, correct
    under BOTH Spark's snapshot semantics and DuckDB's
    sequential-mutation semantics (the CUSUM fold rule)."""
    gap_us = THROTTLE_GAP_S * 1_000_000
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"))
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.expr(
                 "aggregate("
                 "  array_sort(collect_list(struct(us, event_id))),"
                 f" struct(CAST(0 AS BIGINT) AS n,"
                 f"        CAST({_NEG_SENTINEL} AS BIGINT) AS last),"
                 "  (acc, x) -> struct("
                 f"   acc.n + (CASE WHEN x.us - acc.last >= {gap_us}"
                 "            THEN 1 ELSE 0 END) AS n,"
                 f"   CASE WHEN x.us - acc.last >= {gap_us}"
                 "        THEN x.us ELSE acc.last END AS last)"
                 " ).n").cast("long").alias("n_kept"))
    )


# The oracle replays the fold as a RECURSIVE CTE walking each user's
# (rn)-numbered event sequence — NOT list_reduce. The original
# list_reduce-over-grouped-lists formulation is WRONG in DuckDB
# 1.0.0 at scale: with many groups in one hash aggregate, a long
# list's fold returns a different (under-counted) result than the
# identical list folded alone — minimal repro: sf0.1 user 567's
# 73-element list folds to 72 with `WHERE user_id = 567`, 60 inside
# the full GROUP BY; deterministic, threads=1 identical, and a
# literal-list reduce of the same values is correct. Caught by the
# full-registry sf0.1 gate (sf0.01's shorter lists never tripped
# it). The recursive walk matches the pure-Python reference fold at
# all three SFs, user for user.
EVENTS_THROTTLE_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS rn
  FROM (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us
        FROM events)
),
walk(user_id, rn, n, last) AS (
  SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST({_NEG_SENTINEL} AS BIGINT)
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT e.user_id, w.rn + 1,
         w.n + (CASE WHEN e.us - w.last >= {THROTTLE_GAP_S * 1_000_000}
                THEN 1 ELSE 0 END),
         CASE WHEN e.us - w.last >= {THROTTLE_GAP_S * 1_000_000}
              THEN e.us ELSE w.last END
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT w.user_id, c.n_events, CAST(w.n AS BIGINT) AS n_kept
FROM walk w
JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(rn) AS max_rn FROM ev GROUP BY user_id) c
  ON c.user_id = w.user_id AND w.rn = c.max_rn
"""


# ------------------------------------------------- customer_decile_migration
_SPLIT_DATE = "1995-06-01"


def customer_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue-decile migration matrix: rank every customer
    into spend deciles before and after {_SPLIT_DATE}, then count the
    (decile_before, decile_after) transitions for customers active in
    both halves — the churn-vs-upsell movement picture behind
    customer_rfm's static snapshot.

    Decile boundaries are the exact interpolating percentile over the
    per-customer revenue (integer ten-thousandths, so the input set
    is exact); a customer's decile = how many boundaries their
    revenue strictly exceeds — value-based, deterministic under ties,
    and NO global rank window (the boundary array is a broadcast
    1-row aggregate; assignment is a narrow filter-count over a
    9-element array). ONE fact join + ONE partial-agg shuffle to the
    per-(customer, half) revenue table (localCheckpointed — 3 ints
    per active customer-half); both halves' boundary percentiles and
    decile assignments are toy re-reads of it. The per-half shape
    scanned lineitem and orders four times each (r7 scan audit)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")))
        .alias("rev"))
    cutoff = F.to_date(F.lit(_SPLIT_DATE))
    per = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey",
                 (F.col("o_orderdate") >= cutoff).alias("after"))
        .agg((F.sum("rev") * 10000).cast("decimal(38,0)")
             .cast("long").alias("v"))
        .transform(cut)
    )

    def half(after, tag):
        per_cust = per.filter(F.col("after") == after)
        bounds = F.broadcast(per_cust.agg(F.expr(
            "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("bs")))
        return per_cust.crossJoin(bounds).select(
            F.col("o_custkey").alias("custkey"),
            F.expr("CAST(size(filter(bs, b -> v > b)) AS BIGINT)")
            .alias(tag),
        )

    a = half(False, "decile_before")
    b = half(True, "decile_after")
    return (
        a.join(b, "custkey")
        .groupBy("decile_before", "decile_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


CUSTOMER_DECILE_MIGRATION_SQL = f"""
WITH j AS (
  SELECT o_custkey, o_orderdate,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2))
              - CAST(l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
pa AS (
  SELECT o_custkey,
         CAST(CAST(SUM(rev) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS v
  FROM j WHERE o_orderdate < DATE '{_SPLIT_DATE}' GROUP BY o_custkey
),
pb AS (
  SELECT o_custkey,
         CAST(CAST(SUM(rev) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS v
  FROM j WHERE o_orderdate >= DATE '{_SPLIT_DATE}' GROUP BY o_custkey
),
ba AS (SELECT quantile_cont(v,
         [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM pa),
bb AS (SELECT quantile_cont(v,
         [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM pb),
da AS (SELECT o_custkey AS custkey,
              CAST(len(list_filter(ba.bs, b -> v > b)) AS BIGINT)
                AS decile_before
       FROM pa CROSS JOIN ba),
db AS (SELECT o_custkey AS custkey,
              CAST(len(list_filter(bb.bs, b -> v > b)) AS BIGINT)
                AS decile_after
       FROM pb CROSS JOIN bb)
SELECT decile_before, decile_after,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM da JOIN db USING (custkey)
GROUP BY decile_before, decile_after
"""




# --------------------------------------------------------- late_arrival_census
_LATE_N_BUCKETS = 4096  # fixed arrival-order bucket COUNT (not width)


def late_arrival_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness census per event type: treating event_id as
    the arrival sequence, how many events arrive with an event time
    OLDER than something already seen, and how late the worst one is
    — THE diagnostic that sizes a streaming watermark (a 2-day
    watermark is a guess; this measures the actual lateness tail on
    the same feed the streaming jobs consume).

    The running 'max ts seen so far' is exact and global per type yet
    never a low-cardinality global window: arrival ids bucket into a
    FIXED 4096-bucket grid (width = max_id/4096 from a 1-row agg, so
    the grid never grows with the id domain), the in-bucket exclusive
    running max is a (type, bucket)-partitioned window, and the
    cross-bucket exclusive prefix-max is itself a window over the
    O(types x 4096) bucket aggregate — fully distributed; the only
    driver state is the single max_id scalar. Bucketing is internal:
    any width yields the same answer (the oracle has no buckets).
    Lateness stays in integer microseconds; one DIV to whole seconds
    at output."""
    ev0 = load_table(spark, "events", sf_dir).select(
        "event_type", "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"))
    max_id = ev0.agg(F.max("event_id")).collect()[0][0] or 0
    width = max(1, (int(max_id) + _LATE_N_BUCKETS) // _LATE_N_BUCKETS)
    ev = ev0.withColumn("b", F.expr(f"event_id DIV {width}"))
    wb = (
        Window.partitionBy("event_type").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = (
        ev.groupBy("event_type", "b").agg(F.max("us").alias("m"))
        .select("event_type", "b", F.max("m").over(wb).alias("pre"))
    )
    w = (
        Window.partitionBy("event_type", "b").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = (
        ev.withColumn("inb", F.max("us").over(w))
        .join(F.broadcast(off_df), ["event_type", "b"])
        .select(
            "event_type", "us",
            F.greatest(
                F.coalesce("inb", F.lit(-(1 << 62))),
                F.coalesce("pre", F.lit(-(1 << 62)))).alias("seen"),
        )
        .select(
            "event_type",
            F.when(F.col("us") < F.col("seen"),
                   F.col("seen") - F.col("us"))
            .otherwise(F.lit(0)).alias("late_us"),
        )
    )
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("late_us") > 0).cast("long")).cast("long")
            .alias("n_late"),
            F.expr("MAX(late_us) DIV 1000000").cast("long")
            .alias("max_late_s"),
        )
        .select(
            "event_type", "n_events", "n_late", "max_late_s",
            (F.col("n_late").cast("double")
             / F.col("n_events").cast("double")).alias("late_share"),
        )
    )


LATE_ARRIVAL_CENSUS_SQL = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
seen AS (
  SELECT event_type, us,
         MAX(us) OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS seen
  FROM ev
),
late AS (
  SELECT event_type,
         CASE WHEN seen IS NOT NULL AND us < seen THEN seen - us
              ELSE 0 END AS late_us
  FROM seen
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_late_s,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS late_share
FROM late
GROUP BY event_type
"""



# ----------------------------------------------------------- order_total_audit
AUDIT_TOL = "0.01"  # money tolerance, exact decimal literal


def order_total_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial consistency audit: does each order's
    stored o_totalprice equal the recomputed charge
    Σ extprice·(1-disc)·(1+tax) over its lineitems? Per order status:
    order count, orders with NO lineitems at all, orders off by more
    than a cent, and the worst absolute discrepancy — the
    reconciliation pass a warehouse runs before trusting a
    denormalized column (fk_integrity checks the keys; this checks
    the VALUES).

    Exactness: the charge accumulates 6-decimal products of exact
    2-decimal DECIMALs; the discrepancy stays DECIMAL through abs/max
    and casts to double only at output (magnitudes far below 2^53).
    Shape: one fact-fact equi-join shuffle on orderkey (AQE skew
    handling), partial-agg to per-order, bounded status rollup."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("stored"))
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)"))
         * (F.lit(1).cast("decimal(18,2)")
            + F.col("l_tax").cast("decimal(18,2)"))).alias("charge"))
    # r10 (guide §2.3, aggregate before you shuffle): fold lineitem
    # to per-order (n_lines, charge sum) BEFORE the join — the
    # partial agg map-side-combines ~4 lines/order into one row, so
    # the exchange carries order-count rows instead of line-count
    # rows, and the join consumes the agg's hash partitioning (one
    # exchange on each side instead of a full fact-fact line-level
    # shuffle + re-agg). Identical arithmetic: charge is never NULL,
    # so count(*) == count(charge), and an order with no lineitems
    # surfaces as a join miss -> n_lines 0 / adiff NULL exactly as
    # the old left-join + count produced.
    per_li = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("nl"),
             F.sum("charge").cast("decimal(38,6)").alias("computed"))
    )
    per = (
        o.join(per_li, F.col("o_orderkey") == F.col("l_orderkey"),
               "left")
        .select(
            "o_orderstatus",
            F.coalesce(F.col("nl"), F.lit(0).cast("long"))
            .alias("n_lines"),
            F.when(F.col("nl").isNotNull(),
                   F.abs(F.col("stored").cast("decimal(38,6)")
                         - F.col("computed"))).alias("adiff"),
        )
    )
    return (
        per.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum((F.col("n_lines") == 0).cast("long")).cast("long")
            .alias("n_no_lines"),
            F.sum((F.col("adiff") > F.expr(
                f"CAST({AUDIT_TOL} AS DECIMAL(38,6))")).cast("long"))
            .cast("long").alias("n_mismatch"),
            F.max("adiff").cast("double").alias("max_abs_diff"),
        )
    )


ORDER_TOTAL_AUDIT_SQL = f"""
WITH per AS (
  SELECT o.o_orderstatus,
         COUNT(l.l_orderkey) AS n_lines,
         CASE WHEN COUNT(l.l_orderkey) > 0 THEN
           abs(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                    AS DECIMAL(38,6))
               - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l_discount AS DECIMAL(18,2)))
                          * (CAST(1 AS DECIMAL(18,2))
                             + CAST(l_tax AS DECIMAL(18,2))))
                      AS DECIMAL(38,6)))
         END AS adiff
  FROM orders o LEFT JOIN lineitem l ON l_orderkey = o_orderkey
  GROUP BY o.o_orderkey, o.o_orderstatus, o.o_totalprice
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_lines,
       CAST(SUM(CASE WHEN adiff > CAST({AUDIT_TOL} AS DECIMAL(38,6))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(MAX(adiff) AS DOUBLE) AS max_abs_diff
FROM per
GROUP BY o_orderstatus
"""



# ------------------------------------------------------ lifecycle_conformance
def lifecycle_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-conformance census: every user funnel is SUPPOSED to
    run signup -> ... -> purchase; classify each user by whether
    their event history conforms — purchasers with no signup at all,
    purchasers whose first purchase precedes their first signup,
    conformant purchasers, and non-purchasers — plus how many
    individual purchase events fired before the user's first signup.
    The process-mining health check that catches broken
    instrumentation (purchases attributed to pre-account sessions).

    Shape: one partial-agg shuffle to per-user first-times, then the
    per-user table joins events BY THE SAME user_id key (co-
    partitioned, no extra exchange pattern at scale) for the
    event-level violation count. Pure integer microsecond compares;
    exact counts only."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"))
    per = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us")))
            .alias("first_signup"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("us")))
            .alias("first_purchase"),
        )
        # the violation-count join and the final census both read
        # this; each replayed the events scan otherwise (r7 audit)
        .transform(cut)
    )
    cls = (
        F.when(F.col("first_purchase").isNull(), "non_purchaser")
        .when(F.col("first_signup").isNull(), "no_signup_purchaser")
        .when(F.col("first_purchase") < F.col("first_signup"),
              "purchase_before_signup")
        .otherwise("conformant_purchaser")
    )
    early = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per.select("user_id", "first_signup"), "user_id")
        .select(
            "user_id",
            (F.col("first_signup").isNull()
             | (F.col("us") < F.col("first_signup")))
            .cast("long").alias("early"),
        )
        .groupBy("user_id")
        .agg(F.sum("early").cast("long").alias("n_early"))
    )
    return (
        per.join(early, "user_id", "left")
        .select(cls.alias("conformance"),
                F.coalesce("n_early", F.lit(0)).alias("n_early"))
        .groupBy("conformance")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
             F.sum("n_early").cast("long").alias("n_early_purchases"))
    )


LIFECYCLE_CONFORMANCE_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
per AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN us END)
           AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN us END)
           AS first_purchase
  FROM ev GROUP BY user_id
),
early AS (
  SELECT e.user_id,
         CAST(SUM(CASE WHEN p.first_signup IS NULL
                         OR e.us < p.first_signup
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_early
  FROM ev e JOIN per p USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT CASE WHEN first_purchase IS NULL THEN 'non_purchaser'
            WHEN first_signup IS NULL THEN 'no_signup_purchaser'
            WHEN first_purchase < first_signup
              THEN 'purchase_before_signup'
            ELSE 'conformant_purchaser' END AS conformance,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(COALESCE(n_early, 0)) AS BIGINT) AS n_early_purchases
FROM per LEFT JOIN early USING (user_id)
GROUP BY 1
"""



# ------------------------------------------------------- weighted_median_price
_WM_BUCKET = 1 << 20  # price-cent bucket width for the prefix stitch


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median unit price per return flag —
    'half the shipped volume moved at or below this price', which the
    unweighted price_quantiles cannot say and approx_percentile
    cannot weight at all.

    Exact and global with no global window: prices quantize to
    integer cents and aggregate to the (flag, price) value grid;
    cumulative weight = a (flag, price-bucket)-partitioned window
    PLUS a triangular broadcast prefix over the bounded bucket grid
    (the events_concurrency stitch); the answer is the MIN price
    whose cumulative weight reaches the lower-median threshold
    (W+1) DIV 2 — pure integer compares, deterministic under ties.
    One double division (cents -> dollars) at output.

    ONE lineitem scan: the (flag, price) value grid is the
    sufficient statistic (localCheckpointed) — bucket sums, the
    triangular prefix, the in-bucket window, and the per-flag weight
    totals are all re-aggregates of it (the four-branch shape
    re-scanned lineitem four times, r7 scan audit)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
               " AS BIGINT)").alias("pc"),
        F.col("l_quantity").cast("long").alias("w"))
    grid = (
        li.groupBy("l_returnflag", "pc")
        .agg(F.sum("w").cast("long").alias("sw"))
        .withColumn("b", F.expr(f"pc DIV {_WM_BUCKET}"))
        .transform(cut)
    )
    bsum = grid.groupBy("l_returnflag", "b").agg(
        F.sum("sw").cast("long").alias("bw"))
    pre = (
        bsum.alias("x")
        .join(F.broadcast(bsum.alias("y")),
              (F.col("x.l_returnflag") == F.col("y.l_returnflag"))
              & (F.col("y.b") < F.col("x.b")), "left")
        .groupBy(F.col("x.l_returnflag").alias("l_returnflag"),
                 F.col("x.b").alias("b"))
        .agg(F.coalesce(F.sum("y.bw"), F.lit(0)).cast("long")
             .alias("pre"))
    )
    wcum = Window.partitionBy("l_returnflag", "b").orderBy("pc") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = F.broadcast(
        grid.groupBy("l_returnflag")
        .agg(F.sum("sw").cast("long").alias("wtot")))
    cum = (
        grid.withColumn("inb", F.sum("sw").over(wcum))
        .join(F.broadcast(pre), ["l_returnflag", "b"])
        .join(tot, "l_returnflag")
        .select("l_returnflag", "pc", "wtot",
                (F.col("pre") + F.col("inb")).alias("cum"))
    )
    return (
        cum.filter(F.col("cum") >= F.expr("(wtot + 1) DIV 2"))
        .groupBy("l_returnflag")
        .agg(F.min("wtot").alias("total_weight"),
             (F.min("pc").cast("double") / F.lit(100.0))
             .alias("weighted_median_price"))
    )


WEIGHTED_MEDIAN_PRICE_SQL = """
WITH rows_ AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS pc,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
grid AS (
  SELECT l_returnflag, pc, CAST(SUM(w) AS BIGINT) AS sw
  FROM rows_ GROUP BY l_returnflag, pc
),
cum AS (
  SELECT l_returnflag, pc,
         CAST(SUM(sw) OVER (PARTITION BY l_returnflag ORDER BY pc
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM grid
),
tot AS (
  SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS wtot
  FROM rows_ GROUP BY l_returnflag
)
SELECT c.l_returnflag, MIN(wtot) AS total_weight,
       CAST(MIN(pc) AS DOUBLE) / 100.0 AS weighted_median_price
FROM cum c JOIN tot USING (l_returnflag)
WHERE cum >= (wtot + 1) // 2
GROUP BY c.l_returnflag
"""



# ------------------------------------------------------------ bot_rule_census
BOT_VOLUME_N = 50    # rule 1: raw volume
BOT_MONO_N = 10      # rule 2: single-type accounts at this volume
BOT_METRO_N = 10     # rule 3: metronome needs this many gaps
# rule 3 fires when cv^2 of inter-event gaps <= 1/10, tested as the
# exact integer cross-multiplication 10*(n*Σd² - (Σd)²) <= (Σd)²
BOT_CV2_NUM, BOT_CV2_DEN = 1, 10


def bot_rule_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot-detection rule census: per rule, how many users
    trip it — raw volume (R1), single-event-type accounts (R2), and
    metronome regularity (R3: inter-event gap cv² below 1/10 — humans
    are bursty, schedulers are not) — the behavioral sibling of
    gopher_rules' content gates.

    Exactness where variance meets floats: the cv² threshold is
    tested as an integer cross-multiplication over DECIMAL(38,0)
    gap moments (gaps are microsecond BIGINTs; their squares need
    the wide accumulator), so the rule decision never touches a
    double. Shape: one user-partitioned lag window for gaps, one
    partial-agg shuffle per user, bounded rule rollup."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        "event_id")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "user_id", "event_type", "us",
        (F.col("us") - F.lag("us").over(w)).alias("d"))
    per = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.count("d").cast("long").alias("nd"),
            F.sum("d").cast("decimal(38,0)").alias("sd"),
            F.sum(F.col("d").cast("decimal(38,0)")
                  * F.col("d").cast("decimal(38,0)")).alias("sdd"),
        )
    )
    r1 = (F.col("n") >= BOT_VOLUME_N).cast("long")
    r2 = ((F.col("n_types") == 1) & (F.col("n") >= BOT_MONO_N)) \
        .cast("long")
    r3 = (
        (F.col("nd") >= BOT_METRO_N)
        & (F.col("sd") > 0)
        & (F.lit(BOT_CV2_DEN)
           * (F.col("nd") * F.col("sdd") - F.col("sd") * F.col("sd"))
           <= F.lit(BOT_CV2_NUM) * F.col("sd") * F.col("sd"))
    ).cast("long")
    flags = per.select(
        r1.alias("volume"), r2.alias("single_type"),
        F.coalesce(r3, F.lit(0)).alias("metronome"))
    return (
        flags.select(F.explode(F.expr(
            "array(struct('volume' AS rule, volume AS hit), "
            "struct('single_type' AS rule, single_type AS hit), "
            "struct('metronome' AS rule, metronome AS hit))")).alias("e"))
        .groupBy(F.col("e.rule").alias("rule"))
        .agg(F.sum("e.hit").cast("long").alias("n_users"))
    )


BOT_RULE_CENSUS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
         event_id
  FROM events
),
gaps AS (
  SELECT user_id, event_type,
         us - lag(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS d
  FROM ev
),
per AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(COUNT(d) AS BIGINT) AS nd,
         CAST(SUM(d) AS HUGEINT) AS sd,
         CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd
  FROM gaps GROUP BY user_id
),
flags AS (
  SELECT CASE WHEN n >= {BOT_VOLUME_N} THEN 1 ELSE 0 END AS volume,
         CASE WHEN n_types = 1 AND n >= {BOT_MONO_N}
              THEN 1 ELSE 0 END AS single_type,
         CASE WHEN nd >= {BOT_METRO_N} AND sd > 0
                   AND {BOT_CV2_DEN} * (nd * sdd - sd * sd)
                       <= {BOT_CV2_NUM} * sd * sd
              THEN 1 ELSE 0 END AS metronome
  FROM per
)
SELECT rule, CAST(SUM(hit) AS BIGINT) AS n_users
FROM (
  SELECT 'volume' AS rule, volume AS hit FROM flags
  UNION ALL SELECT 'single_type', single_type FROM flags
  UNION ALL SELECT 'metronome', metronome FROM flags
)
GROUP BY rule
"""

QUERIES = {
    "events_mad_outliers": events_mad_outliers,
    "audience_overlap": audience_overlap,
    "events_throttle": events_throttle,
    "customer_decile_migration": customer_decile_migration,
    "late_arrival_census": late_arrival_census,
    "order_total_audit": order_total_audit,
    "lifecycle_conformance": lifecycle_conformance,
    "weighted_median_price": weighted_median_price,
    "bot_rule_census": bot_rule_census,
}

ORACLES = {
    "events_mad_outliers": EVENTS_MAD_OUTLIERS_SQL,
    "audience_overlap": AUDIENCE_OVERLAP_SQL,
    "events_throttle": EVENTS_THROTTLE_SQL,
    "customer_decile_migration": CUSTOMER_DECILE_MIGRATION_SQL,
    "late_arrival_census": LATE_ARRIVAL_CENSUS_SQL,
    "order_total_audit": ORDER_TOTAL_AUDIT_SQL,
    "lifecycle_conformance": LIFECYCLE_CONFORMANCE_SQL,
    "weighted_median_price": WEIGHTED_MEDIAN_PRICE_SQL,
    "bot_rule_census": BOT_RULE_CENSUS_SQL,
}
