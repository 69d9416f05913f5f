"""Relational/curation wave 5: rolling-order statistics, vocabulary
growth, graph degree census, month-over-month trend, and text
normalization.

Reference analogue: each of these is the shape of a 1-2 round
maple/juice chain over SDFS intermediates (per-key shuffle + reduce,
/root/reference/maple_juice/maple_juice.go:241 exe contract); here
each is a single Catalyst plan with partial aggregation.

Exactness discipline matches relational.py / relational_ext4.py:
integer arithmetic wherever possible, DECIMAL accumulators for money,
doubles only in fixed evaluation order replicated verbatim in the
DuckDB oracle (e.g. the rolling median is (a+b)/2 of two sorted
elements on BOTH engines — never the engine's own median(), whose
interpolation expression may differ in float op order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

_ROLL_N = 10  # rolling frame length (rows), per user


def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of `value` over each user's last
    {n} events (rows frame, ordered by ts/event_id) — the robust
    smoother behind rate-limit/anomaly baselines where the mean is
    skew-fragile.

    Shape: one user-partitioned window (never global) with a BOUNDED
    rows frame — state per row is {n} doubles, independent of corpus
    size. The median is computed from the sorted frame array with an
    explicit (a+b)/2 midpoint so the float expression is identical on
    both engines (engine-native median()/quantile interpolation is
    a + 0.5*(b-a) in some engines — not bit-identical).
    """.format(n=_ROLL_N)
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_N - 1), Window.currentRow)
    )
    fr = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.array_sort(F.collect_list("value").over(w)).alias("s"),
    )
    return fr.select(
        "event_id", "user_id", "event_type", "value",
        F.expr(
            "CASE WHEN size(s) % 2 = 1 "
            "THEN element_at(s, CAST((size(s)+1) DIV 2 AS INT)) "
            "ELSE (element_at(s, CAST(size(s) DIV 2 AS INT)) "
            "      + element_at(s, CAST(size(s) DIV 2 + 1 AS INT))) / 2 END"
        ).alias("roll_med"),
    )


EVENTS_ROLLING_MEDIAN_SQL = f"""
WITH fr AS (
  SELECT event_id, user_id, event_type, value,
         list_sort(list(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {_ROLL_N - 1} PRECEDING AND CURRENT ROW)) AS s
  FROM events
)
SELECT event_id, user_id, event_type, value,
       CASE WHEN len(s) % 2 = 1 THEN s[(len(s)+1) // 2]
            ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2 END AS roll_med
FROM fr
"""


_VOCAB_BUCKET = 50  # docs per growth-curve bucket


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve over word-BIGRAM units:
    scanning documents in doc_id order, how many NEW distinct bigrams
    does each bucket of {b} docs contribute, and what is the
    cumulative vocabulary size — the tokenizer-sizing /
    merge-candidate-space diagnostic (unigrams saturate instantly on a
    bounded vocab; the bigram space is where growth lives).

    Shape: per-doc array_distinct before the explode (caps the shuffle
    at distinct-bigrams-per-doc), one partial-agg shuffle to
    min(doc_id) per bigram, one to bucket counts. The cumulative sum
    is NOT a global window: buckets are O(#docs/{b}) aggregate rows,
    so a broadcast triangular self-join (b2 <= b) computes the prefix
    sum with bounded fan-out — same discipline as orders_backlog's
    stitched cumsum.
    """.format(b=_VOCAB_BUCKET)
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select("doc_id", X.tokens().alias("toks"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(X.shingles_from("toks")))).alias("tok"),
    )
    first = grams.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    nb = (
        first.select(F.expr(f"first_doc DIV {_VOCAB_BUCKET}").alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("n_new_tokens"))
    )
    from distributed_system_mapreduce_spark.functions.rollups import (
        triangular_cumsum,
    )

    return triangular_cumsum(nb, "bucket", "n_new_tokens", "vocab_size")


VOCAB_GROWTH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({X.SHINGLES_SQL})) AS tok
  FROM documents
),
first AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
nb AS (
  SELECT first_doc // {_VOCAB_BUCKET} AS bucket,
         COUNT(*) AS n_new_tokens
  FROM first GROUP BY 1
)
SELECT a.bucket, a.n_new_tokens,
       CAST(SUM(b.n_new_tokens) AS BIGINT) AS vocab_size
FROM nb a JOIN nb b ON b.bucket <= a.bucket
GROUP BY a.bucket, a.n_new_tokens
"""


_DEG_SUPPORT = 2  # same strong-tie threshold as triangle_count


def graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the strong co-purchase graph (edges =
    part pairs co-ordered in >= {s} distinct orders): degree ->
    node count — the skew census you run BEFORE any per-node graph
    algorithm (it is what tells you whether pagerank/triangles need
    hub-splitting at scale).

    Shape: the canonical u<v edge build (linear in orders, see
    triangle_count), symmetrized by a cheap union, then two partial-agg
    shuffles (degree per node, nodes per degree). Output is bounded by
    the max degree.
    """.format(s=_DEG_SUPPORT)
    from distributed_system_mapreduce_spark.functions.graphs import (
        strong_undirected,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = strong_undirected(li, _DEG_SUPPORT).select("u", "v")
    sym = edges.union(edges.select(F.col("v"), F.col("u")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


GRAPH_DEGREE_DIST_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_DEG_SUPPORT}
),
sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
deg AS (SELECT u AS node, COUNT(*) AS degree FROM sym GROUP BY u)
SELECT degree, COUNT(*) AS n_nodes
FROM deg GROUP BY degree
"""


def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order volume and revenue growth — the trend
    dashboard: per calendar month, order count, revenue, and the
    relative change vs the previous month (NULL for the first).

    Revenue goes through a DECIMAL(18,2) accumulator (o_totalprice is
    a 2-decimal money double; summation-order-independent), DOUBLE at
    output. The previous-month lookup is a broadcast self-join on
    month_key - 1 over the ALREADY-AGGREGATED month table (bounded by
    the calendar) — no global window anywhere.
    """
    o = load_table(spark, "orders", sf_dir)
    m = (
        o.groupBy(F.year("o_orderdate").alias("yr"),
                  F.month("o_orderdate").alias("mon"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("revenue"),
        )
        .withColumn("mkey", F.col("yr") * 12 + F.col("mon"))
    )
    prev = m.select(
        (F.col("mkey") + 1).alias("mkey"),
        F.col("revenue").alias("prev_revenue"),
    )
    return (
        m.join(F.broadcast(prev), "mkey", "left")
        .select(
            "yr", "mon", "n_orders", "revenue", "prev_revenue",
            ((F.col("revenue") - F.col("prev_revenue"))
             / F.col("prev_revenue")).alias("mom_growth"),
        )
    )


ORDERS_MOM_GROWTH_SQL = """
WITH m AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         EXTRACT(month FROM o_orderdate) AS mon,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
         EXTRACT(year FROM o_orderdate) * 12
           + EXTRACT(month FROM o_orderdate) AS mkey
  FROM orders GROUP BY 1, 2
)
SELECT a.yr, a.mon, a.n_orders, a.revenue,
       b.revenue AS prev_revenue,
       (a.revenue - b.revenue) / b.revenue AS mom_growth
FROM m a LEFT JOIN m b ON a.mkey = b.mkey + 1
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text canonicalization emit: lowercase, map
    non-alphanumerics to spaces, collapse space runs, trim — the
    cleanup pass that precedes tokenizer training, plus a changed flag
    and the post-normalization token count.

    Narrow per-row expressions only (no shuffle at all — the plan is
    scan -> project); the regex classes are chosen from the Java/RE2
    common subset (see functions/text.py on the \\v divergence) so
    Spark and DuckDB replace identically.
    """
    docs = spread(load_table(spark, "documents", sf_dir))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +", " "))
    staged = docs.select("doc_id", "text", norm.alias("norm_text"))
    return staged.select(
        "doc_id",
        "norm_text",
        F.expr("size(filter(split(norm_text, ' '), t -> t <> ''))")
        .alias("n_tokens_norm"),
        (F.col("norm_text") != F.col("text")).cast("long").alias("changed"),
    )


TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       len(list_filter(string_split(norm_text, ' '), t -> t <> ''))
         AS n_tokens_norm,
       CAST(norm_text <> text AS BIGINT) AS changed
FROM n
"""


QUERIES = {
    "events_rolling_median": events_rolling_median,
    "vocab_growth": vocab_growth,
    "graph_degree_dist": graph_degree_dist,
    "orders_mom_growth": orders_mom_growth,
    "text_normalize": text_normalize,
}

ORACLES = {
    "events_rolling_median": EVENTS_ROLLING_MEDIAN_SQL,
    "vocab_growth": VOCAB_GROWTH_SQL,
    "graph_degree_dist": GRAPH_DEGREE_DIST_SQL,
    "orders_mom_growth": ORDERS_MOM_GROWTH_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
}


def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, vs
    the corpus max date), frequency (order count), monetary (total
    spend), each scored into exact quartiles — the classic
    customer-value census behind retention/marketing splits.

    Shape: one partial-agg shuffle to the per-customer table
    (customer-dim scale, localCheckpointed — the quartile aggregate
    and the scorer both reference it, and each replayed the orders
    scan otherwise; r7 scan audit: 4 orders scans, now 2 — the
    date-endcap max and the per-customer agg), then ONE
    array-percentile aggregate per metric over that table (1-row
    result, broadcast back) and a branchless
    1 + (x>t1) + (x>t2) + (x>t3) scorer — no window anywhere, no
    per-row sort. Percentile interpolation matches DuckDB's
    quantile_cont bit-for-bit (same guarantee price_quantiles relies
    on); monetary goes through the DECIMAL accumulator, DOUBLE at
    output.
    """
    o = load_table(spark, "orders", sf_dir)
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("mxd")))
    per_cust = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("f_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("m_spend"),
        )
        .crossJoin(mx)
        .select(
            "c_custkey",
            F.datediff(F.to_date("mxd"), F.to_date("last_order"))
            .alias("r_days"),
            "f_orders", "m_spend",
        )
        .transform(cut)
    )
    qs = F.broadcast(per_cust.agg(
        F.expr("percentile(r_days, array(0.25, 0.5, 0.75))").alias("rq"),
        F.expr("percentile(f_orders, array(0.25, 0.5, 0.75))").alias("fq"),
        F.expr("percentile(m_spend, array(0.25, 0.5, 0.75))").alias("mq"),
    ))

    def score(col, q):
        return (
            F.lit(1)
            + (F.col(col) > F.element_at(F.col(q), 1)).cast("int")
            + (F.col(col) > F.element_at(F.col(q), 2)).cast("int")
            + (F.col(col) > F.element_at(F.col(q), 3)).cast("int")
        )

    return (
        per_cust.crossJoin(qs)
        .select(
            "c_custkey", "r_days", "f_orders", "m_spend",
            score("r_days", "rq").alias("r_score"),
            score("f_orders", "fq").alias("f_score"),
            score("m_spend", "mq").alias("m_score"),
        )
    )


CUSTOMER_RFM_SQL = """
WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
per_cust AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   CAST((SELECT mxd FROM mx) AS DATE)) AS r_days,
         COUNT(*) AS f_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS m_spend
  FROM orders GROUP BY o_custkey
),
qs AS (
  SELECT quantile_cont(r_days, 0.25) AS r1, quantile_cont(r_days, 0.5) AS r2,
         quantile_cont(r_days, 0.75) AS r3,
         quantile_cont(f_orders, 0.25) AS f1,
         quantile_cont(f_orders, 0.5) AS f2,
         quantile_cont(f_orders, 0.75) AS f3,
         quantile_cont(m_spend, 0.25) AS m1, quantile_cont(m_spend, 0.5) AS m2,
         quantile_cont(m_spend, 0.75) AS m3
  FROM per_cust
)
SELECT c_custkey, r_days, f_orders, m_spend,
       1 + CAST(r_days > r1 AS INT) + CAST(r_days > r2 AS INT)
         + CAST(r_days > r3 AS INT) AS r_score,
       1 + CAST(f_orders > f1 AS INT) + CAST(f_orders > f2 AS INT)
         + CAST(f_orders > f3 AS INT) AS f_score,
       1 + CAST(m_spend > m1 AS INT) + CAST(m_spend > m2 AS INT)
         + CAST(m_spend > m3 AS INT) AS m_score
FROM per_cust CROSS JOIN qs
"""

QUERIES["customer_rfm"] = customer_rfm
ORACLES["customer_rfm"] = CUSTOMER_RFM_SQL


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / revenue-concentration curve: customers bucketed into
    exact spend deciles, each decile's customer count, revenue, and
    share of total — "do the top 10% drive 60% of revenue".

    Shape: per-customer rollup (one partial-agg shuffle), ONE
    array-percentile aggregate for the 9 decile cutoffs (1-row,
    broadcast back), branchless decile scorer, then a second bounded
    partial agg over 10 groups. No global sort/window — the global
    ranking problem is reduced to threshold comparisons. Revenue
    stays in the DECIMAL accumulator through BOTH aggregations;
    share is one double division against the broadcast grand total.
    """
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("decimal(18,2)").alias("spend_dec"))
        .withColumn("spend", F.col("spend_dec").cast("double"))
    )
    cuts = ", ".join(str(i / 10) for i in range(1, 10))
    qs = F.broadcast(per_cust.agg(
        F.expr(f"percentile(spend, array({cuts}))").alias("qq"),
        F.sum("spend_dec").cast("decimal(38,6)").alias("total_dec"),
    ))
    decile = sum(
        ((F.col("spend") > F.element_at(F.col("qq"), i)).cast("int")
         for i in range(1, 10)),
        F.lit(1),
    )
    return (
        per_cust.crossJoin(qs)
        .select("spend_dec", "total_dec", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("spend_dec").cast("decimal(38,6)").cast("double")
            .alias("revenue"),
            (F.sum("spend_dec").cast("decimal(38,6)").cast("double")
             / F.first("total_dec").cast("double")).alias("rev_share"),
        )
    )


REVENUE_CONCENTRATION_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS spend_dec,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
qs AS (
  SELECT [{", ".join(f"quantile_cont(spend, {i / 10})"
                     for i in range(1, 10))}] AS qq,
         CAST(SUM(spend_dec) AS DECIMAL(38,6)) AS total_dec
  FROM per_cust
)
SELECT 1 {" ".join(f"+ CAST(spend > qq[{i}] AS INT)"
                   for i in range(1, 10))} AS decile,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM(spend_dec) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       CAST(CAST(SUM(spend_dec) AS DECIMAL(38,6)) AS DOUBLE)
         / CAST(ANY_VALUE(total_dec) AS DOUBLE) AS rev_share
FROM per_cust CROSS JOIN qs
GROUP BY 1
"""


def events_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap: event count and distinct
    users per (dow, hour) cell — the capacity-planning / anomaly
    baseline census. Bounded output (168 cells), one partial-agg
    shuffle; dow normalized to DuckDB's 0=Sunday convention."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.select((F.dayofweek("ts") - 1).alias("dow"),
                  F.hour("ts").alias("hour"), "user_id")
        .groupBy("dow", "hour")
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
    )


EVENTS_HOUR_HEATMAP_SQL = """
SELECT EXTRACT(dow FROM ts) AS dow, EXTRACT(hour FROM ts) AS hour,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

QUERIES["revenue_concentration"] = revenue_concentration
ORACLES["revenue_concentration"] = REVENUE_CONCENTRATION_SQL
QUERIES["events_hour_heatmap"] = events_hour_heatmap
ORACLES["events_hour_heatmap"] = EVENTS_HOUR_HEATMAP_SQL


def events_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key JOIN posture: enrich the event stream with a per-user
    profile dim through the manual salted join (fact side salted,
    dim replicated across salts) — the fallback when AQE skew
    splitting isn't available and the dim is too big to broadcast.
    Values must be IDENTICAL to the plain equi-join (the oracle runs
    the unsalted join): salting only changes row routing.

    Output is the bounded per-type rollup; integer aggregates only.
    """
    from distributed_system_mapreduce_spark.functions.skew import (
        salted_join,
    )

    ev = load_table(spark, "events", sf_dir)
    dim = ev.groupBy("user_id").agg(
        F.count("*").alias("n_user_events"))
    j = salted_join(ev.select("user_id", "event_type"), dim,
                    "user_id", n_salts=8)
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("n_user_events").cast("long").alias("sum_peer_events"),
    )


EVENTS_SKEW_JOIN_SQL = """
WITH dim AS (
  SELECT user_id, COUNT(*) AS n_user_events FROM events GROUP BY user_id
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(n_user_events) AS BIGINT) AS sum_peer_events
FROM events JOIN dim USING (user_id)
GROUP BY event_type
"""

QUERIES["events_skew_join"] = events_skew_join
ORACLES["events_skew_join"] = EVENTS_SKEW_JOIN_SQL


def fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    foreign-key edge (lineitem->orders, lineitem->part,
    lineitem->supplier, orders->customer, customer->nation), the child
    row count and how many child rows have NO parent — the ingest
    gate that catches broken joins before queries silently drop rows.

    Shape: ONE pass per child table, not one per edge — lineitem's
    three FK edges resolve in a single scan via left joins with
    null-marker counting (dims broadcast; the fact-fact edge shuffles
    on its key with AQE), so the 100 TB fact table is read once where
    the per-edge anti-join shape read it six times (r7 scan audit).
    The 1-row wide aggregates are localCheckpointed before fanning
    into the long-form report — each of the three lineitem rows
    references the same aggregate, and without the barrier Catalyst
    replays the scan under each reference.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)

    def parent_keys(parent, pk, ck, bcast):
        keys = parent.select(F.col(pk).alias(ck)).distinct() \
            .withColumn(f"{ck}_hit", F.lit(1))
        return F.broadcast(keys) if bcast else keys

    def orphan_sum(ck):
        return F.sum(
            F.when(F.col(f"{ck}_hit").isNull(), 1).otherwise(0)
        ).cast("long")

    li_row = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(parent_keys(o, "o_orderkey", "l_orderkey", False),
              "l_orderkey", "left")
        .join(parent_keys(p, "p_partkey", "l_partkey", True),
              "l_partkey", "left")
        .join(parent_keys(s, "s_suppkey", "l_suppkey", True),
              "l_suppkey", "left")
        .agg(
            F.count("*").alias("n_child"),
            orphan_sum("l_orderkey").alias("orph_orders"),
            orphan_sum("l_partkey").alias("orph_part"),
            orphan_sum("l_suppkey").alias("orph_supplier"),
        )
        .transform(cut)
    )
    o_row = (
        o.select("o_custkey")
        .join(parent_keys(c, "c_custkey", "o_custkey", True),
              "o_custkey", "left")
        .agg(F.count("*").alias("n_child"),
             orphan_sum("o_custkey").alias("n_orphans"))
    )
    c_row = (
        c.select("c_nationkey")
        .join(parent_keys(n, "n_nationkey", "c_nationkey", True),
              "c_nationkey", "left")
        .agg(F.count("*").alias("n_child"),
             orphan_sum("c_nationkey").alias("n_orphans"))
    )

    def li_edge(name, col):
        return li_row.select(
            F.lit(name).alias("fk_edge"), "n_child",
            F.col(col).alias("n_orphans"))

    return (
        li_edge("lineitem->orders", "orph_orders")
        .unionByName(li_edge("lineitem->part", "orph_part"))
        .unionByName(li_edge("lineitem->supplier", "orph_supplier"))
        .unionByName(o_row.select(
            F.lit("orders->customer").alias("fk_edge"),
            "n_child", "n_orphans"))
        .unionByName(c_row.select(
            F.lit("customer->nation").alias("fk_edge"),
            "n_child", "n_orphans"))
    )


FK_INTEGRITY_SQL = """
SELECT 'lineitem->orders' AS fk_edge,
       (SELECT COUNT(*) FROM lineitem) AS n_child,
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""

QUERIES["fk_integrity"] = fk_integrity
ORACLES["fk_integrity"] = FK_INTEGRITY_SQL


_EWMA_ALPHA_NUM, _EWMA_ALPHA_DEN = 3, 10  # alpha = 0.3, exact rational


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of `value` over each
    user's last {n} events — the time-series smoother where recent
    points dominate. Computed as an explicit left fold over the
    sorted bounded frame (oldest -> newest):
    acc = acc + alpha * (x - acc), alpha = {a}/{d} evaluated as
    double division once — the SAME float op sequence on both engines
    (a recursive-CTE EWMA or engine-native ewm would not be
    replicable bit-for-bit).

    Same scale posture as events_rolling_median: user-partitioned
    window, {n}-row frame, state independent of history length.
    """.format(n=_ROLL_N, a=_EWMA_ALPHA_NUM, d=_EWMA_ALPHA_DEN)
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_N - 1), Window.currentRow)
    )
    alpha = f"(CAST({_EWMA_ALPHA_NUM} AS DOUBLE) / {_EWMA_ALPHA_DEN})"
    fr = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.collect_list("value").over(w).alias("s"),
    )
    return fr.select(
        "event_id", "user_id", "event_type", "value",
        F.expr(
            "aggregate(slice(s, 2, size(s) - 1), "
            "CAST(element_at(s, 1) AS DOUBLE), "
            f"(acc, x) -> acc + {alpha} * (CAST(x AS DOUBLE) - acc))"
        ).alias("ewma"),
    )


EVENTS_EWMA_SQL = f"""
WITH fr AS (
  SELECT event_id, user_id, event_type, value,
         list(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {_ROLL_N - 1} PRECEDING AND CURRENT ROW) AS s
  FROM events
)
SELECT event_id, user_id, event_type, value,
       list_reduce(list_transform(s, x -> CAST(x AS DOUBLE)),
         (acc, x) -> acc + (CAST({_EWMA_ALPHA_NUM} AS DOUBLE)
                            / {_EWMA_ALPHA_DEN}) * (x - acc)) AS ewma
FROM fr
"""

QUERIES["events_ewma"] = events_ewma
ORACLES["events_ewma"] = EVENTS_EWMA_SQL
