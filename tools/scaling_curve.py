"""Scaling-curve evidence: time the most expensive queries at 1x / 2x
/ 5x / 10x the sf0.1 corpus (10x = sf1-equivalent volume) and record time-vs-volume slopes — the direct
measurement behind "would this plan survive 100x", and a tripwire for
any accidental driver-side or pairwise O(n^2) (a superlinear ratio
shows up immediately).

Corpus construction (DuckDB, no Spark): each table is K offset-shifted
copies of sf0.1 — every key column gets copy_i * (max_key + 1) added,
so per-key cardinalities, join fan-outs, and group sizes stay CONSTANT
while row volume scales by K (the shape a bigger day of the same feed
would have). documents.text is vowel-rotated per copy so the scaled
corpus doesn't consist of K exact/near copies of every document —
cross-copy duplicate cliques would add a real K^2 pair blowup to the
dedup family that says nothing about plan scaling. nation/region are
fixed dims and are not scaled.

Usage: python tools/scaling_curve.py [--mult 1,2,5,10] [out_json]
[query ...]
(a query subset re-times just those entries and MERGES them into
out_json, for spot re-runs after a contaminated measurement or a
deeper --mult panel on a few queries; every row carries its OWN
`multipliers` list so a merged artifact never misrepresents what a
stale row was measured under — ADVICE r5)
Writes SCALING.json {query: {t1, t2, t5, t10, ratio2, ratio5,
ratio10, multipliers}} and prints
one summary line per query. Queries whose absolute 1x time is under
FLOOR_SEC are dominated by fixed scheduling overhead locally; their
ratios are reported but the linearity verdict keys off the 5x ratio
with that floor subtracted (the 10x ratio when present).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scaling"
MULTIPLIERS = (1, 2, 5, 10)
FLOOR_SEC = 0.35  # local fixed overhead per query (scheduling, py4j)

# top of BENCH_DETAIL r2 by cost, minus the exe/subprocess path (its
# cost is subprocess spawn, not data) — the queries where a
# superlinearity would hurt most at 100 TB
QUERIES_UNDER_TEST = [
    "bpe_token_count", "kmeans_embed", "bpe_vocab_stats",
    "bpe_train_merges", "pagerank_parts", "kcore_census",
    "dedup_agreement", "graph_bfs_reach", "mr_wordcount",
    "q2_best_supplier", "dedup_survivorship", "community_lpa",
    "assoc_rules", "q7_nation_volume", "triangle_count",
    "dedup_minhash_estimate", "order_total_audit", "graph_degree_dist",
    "q16_supplier_counts", "freq_items_sketch", "dedup_minhash",
    "late_arrival_census",
    # round-3 additions: per-doc sorted-fold scorers + the real-codec
    # roundtrip (Python kernel — linear per doc by construction)
    "dsir_importance", "doc_lm_typicality", "multimodal_codec_roundtrip",
    # entropy/graph/retrieval waves: the wedge join (clustering_coeff)
    # and the positional RAKE segmentation are the two new shapes where
    # a superlinearity could hide
    "clustering_coeff", "keyphrase_rake", "kmv_set_ops",
    "doc_token_entropy", "ndcg_eval",
    # round-4 additions: the skip-gram pair fan-out, the bucket census
    # over the band table, the hashed-grid entropy fold, and the
    # restructured single-pass bm25 consumers
    "skipgram_lift", "lsh_bucket_balance", "bigram_entropy_rate",
    "retrieval_pr_eval", "hits_scores", "dataset_card",
    # round-5 additions: the FileStore write+read-back trio (merge
    # must stay ~linear: only touched buckets rewrite), the
    # interval-overlap bucketized join, and the LSH-pair cosine
    # histogram
    "filestore_bucketed_join", "filestore_snapshot_read",
    "filestore_keyed_merge", "mr_contact_trace", "embedding_cos_hist",
    "dedup_cross_lang",
    # round-6 additions: the IVF-PQ composition (probe join + ADC
    # fold — the new ANN shape) and the MG certification's vocabulary
    # rollup (the one new full-vocab shuffle)
    "ann_topk_ivfpq", "freq_items_certify",
    # round-7 additions: the scan-reduction rewrites with the largest
    # checkpointed intermediates — the at-scale claim (constant
    # checkpoint job vs O(data) saved scans) measured, not asserted
    "user_survival_km", "fk_integrity", "customer_decile_migration",
    "tfidf_topterms", "audience_overlap", "user_traj_topk",
    "bpe_certify",
    # round-8 additions: the two new hash-gated operators (the curve
    # shares training's per-round barriers; the margin census is the
    # new posexplode + broadcast-centroid + per-vec-window shape)
    "bpe_compression_curve", "label_centroid_margin",
    "embedding_cov_topk",
    # round-9 additions: the incremental-maintenance pair — CC label
    # upkeep (contraction join + CC on the delta graph only) and
    # boundary-stitched sessionization (two windows, never one over
    # the union) — the shapes whose scaling IS their reason to exist;
    # plus the persisted-LSH-index write+probe roundtrip (write-
    # dominated like the other filestore rows)
    "dedup_components_incremental", "events_sessionize_incremental",
    "filestore_lsh_probe",
    # the SCD-2 bucketized as-of (fact side must stay one broadcast
    # probe per order) and the label-scoped exact ANN (per-label
    # candidate sets grow linearly with the corpus)
    "scd2_rate_join", "ann_topk_same_label",
    # r10 membership-protocol family: gossip is R_MAX bounded rounds
    # of explode+distinct over the roster (offset-shifted custkeys
    # stay contiguous 0..10N-1, so the sim runs a genuinely 10x
    # cluster); the census is one partitioned lag-window; the merge
    # a per-slot top-1 + partial agg
    "gossip_dissemination", "failure_detection_census",
    "membership_lww_merge", "replica_rebalance_census",
]

# Queries whose RESULT grows faster than the input under this corpus
# construction — the superlinear flag is then semantics, not plan
# (the tripwire is kept, the note explains it and the measured
# output growth is recorded alongside).
OUTPUT_BOUND_NOTES = {
    "dedup_agreement": (
        "cost is bounded by the LSH/SimHash CANDIDATE-PAIR population, "
        "which grows quadratically as the synthetic corpus densifies "
        "band buckets (measured: 33.1k LSH pairs at 10x -> 182.6k at "
        "20x = 5.5x pairs for 2x rows) while runtime grew only 3.5x "
        "over the same step — time PER CANDIDATE PAIR falls; the plan "
        "is sublinear in its true workload. On a real 100 TB corpus "
        "the pair population is tuned by banding parameters "
        "(lsh_bucket_balance is the watch query), not by row count."),
    "ann_topk_ivfpq": (
        "the elevated ratio20 is the IVF auto-scale FLOOR regime, not "
        "the plan: below the 64k-vector knee the codebook stays at the "
        "16-cell floor (similarity.ivf_cells), so candidates/query grow "
        "linearly and scored pairs quadratically — bounded by design at "
        "<= the knee. Measured through the knee: x40 (80k vectors) "
        "doubles the codebook to 32 cells, candidates/query go flat, "
        "and the step ratio drops to t40/t20 = 2.07x for 2x data — "
        "exactly linear. At 100 TB the codebook is always past the "
        "knee, in the sqrt(n)-cells regime this measures."),
    "mr_contact_trace": (
        "join key is (event_type, time-bucket); the corpus multiplies "
        "user density at FIXED places/times, so true contact pairs "
        "grow quadratically (measured: 455k pairs at 1x -> 45.5M at "
        "10x = 100.0x). Runtime 10x-ratio ~39x < 100x output growth: "
        "time PER OUTPUT PAIR falls 2.6x — the plan is sublinear in "
        "result size, which is the only meaningful bound for a query "
        "whose answer is itself quadratic in co-located users."),
}

# key columns to offset-shift per table (copy i adds i * (max+1))
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ("nation", "region")

_VOWEL_ROT = ["aeiou", "eioua", "iouae", "ouaei", "uaeio"]


def build_corpus(k: int) -> str:
    import duckdb

    out = f"{WORK}/x{k}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED_DIMS:
        con.execute(f"COPY (SELECT * FROM '{BASE}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t, keys in KEYED.items():
        src = f"'{BASE}/{t}.parquet'"
        offs = {kc: con.execute(
            f"SELECT max({kc}) + 1 FROM {src}").fetchone()[0]
            for kc in keys}
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM {src}").fetchall()]
        parts = []
        for i in range(k):
            sel = []
            for c in cols:
                if c in offs:
                    sel.append(f"({c} + {i} * {offs[c]}) AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    rot = _VOWEL_ROT[i % len(_VOWEL_ROT)]
                    sel.append(f"translate(text, 'aeiou', '{rot}') AS text")
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM {src}")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    open(f"{out}/_DONE", "w").write("ok")
    return out


# ---------------------------------------------------------- skew panel
# The offset-shifted scaling corpora hold per-key cardinality CONSTANT,
# so the salted paths (events_skew_rollup / events_skew_join,
# functions/skew.py) had never been measured under actual skew. The
# zipf corpus fixes that: user_id is remapped through a deterministic
# Pareto inverse-CDF (alpha below; the hottest user owns ~half the
# rows — the classic straggler) and event_type collapses to one
# dominant value on ~85% of rows. Measured: salted vs plain twins on
# the SAME corpus, with auto-broadcast DISABLED (the 100 TB scenario
# salting exists for is a dim too big to broadcast; with broadcast on,
# Catalyst sidesteps the skew and the comparison measures nothing),
# and the plain join both with and without AQE skew-splitting.
SKEW_ALPHA = 1.1
SKEW_HOT_TYPE_SHARE = 0.85


def build_embed_corpus(k: int) -> str:
    """embeddings-ONLY corpus at k x sf0.1 vector count, for the ANN
    above-the-knee panel (tools/ann_knee.py): vec_id offset-shifts
    like build_corpus, but each copy i also ROTATES the embedding
    dimensions by i % DIM positions — identical copies would plant
    k-1 exact duplicates per vector, making every index's top-k
    trivially easy and the recall measurement meaningless; rotations
    preserve norms and the pairwise-distance distribution while
    being genuinely distinct vectors. label is carried unchanged.
    Copy 0 is bit-identical to sf0.1, so the fixed 64-query panel
    (vec_id % 100 == 0, < 6400) and the deterministic seed rows
    (lowest vec_ids) still exist."""
    import duckdb

    out = f"{WORK}/emb{k}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    src = f"'{BASE}/embeddings.parquet'"
    off = con.execute(f"SELECT max(vec_id) + 1 FROM {src}").fetchone()[0]
    dim = con.execute(
        f"SELECT len(embedding) FROM {src} LIMIT 1").fetchone()[0]
    parts = []
    for i in range(k):
        r = i % dim
        emb = ("embedding" if r == 0
               else f"embedding[{r + 1}:] || embedding[1:{r}]")
        parts.append(
            f"SELECT vec_id + {i} * {off} AS vec_id, "
            f"{emb} AS embedding, label FROM {src}")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) "
                f"TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    open(f"{out}/_DONE", "w").write("ok")
    return out


def build_deep_corpus(k: int) -> str:
    """Full-table corpus at k x sf0.1 volume where PER-KEY SEQUENCE
    DEPTH grows with k — the dimension build_corpus deliberately
    holds constant (it offset-shifts user_id/doc grouping keys, so
    every copy is a fresh population and per-user lists never grow).
    This is the sf1-shaped stress the r9 verdict asked for: the
    sorted-fold / recursive-CTE DuckDB oracles (events_throttle,
    user_survival_km, events_cusum, decayed_popularity,
    dataset_card) walk per-key ordered lists, and the r9 sf0.1 gate
    caught a real DuckDB list_reduce bug exactly when those lists got
    long — so the oracle cliff tracks LIST LENGTH, not row count.

    events: event_id offsets per copy (uniqueness), user_id is
    carried UNCHANGED, and ts shifts by copy * (span + 1 day) so the
    k copies are time-disjoint — every user's ordered sequence is
    genuinely k x longer with no duplicate timestamps. documents:
    doc_id offsets, source/lang carried unchanged (per-source lists
    grow k x), text vowel-rotates like build_corpus so no planted
    exact duplicates. All other tables copy through from sf0.1
    (needed only for view registration / ANN preflight)."""
    import duckdb

    out = f"{WORK}/deep{k}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "embeddings").split():
        con.execute(f"COPY (SELECT * FROM '{BASE}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    src = f"'{BASE}/events.parquet'"
    off = con.execute(
        f"SELECT max(event_id) + 1 FROM {src}").fetchone()[0]
    span = con.execute(
        f"SELECT date_diff('second', min(ts), max(ts)) + 86400 "
        f"FROM {src}").fetchone()[0]
    parts = [
        f"SELECT * REPLACE (event_id + {i} * {off} AS event_id, "
        f"ts + INTERVAL ({i} * {span}) SECOND AS ts) FROM {src}"
        for i in range(k)
    ]
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) "
                f"TO '{out}/events.parquet' (FORMAT PARQUET)")
    dsrc = f"'{BASE}/documents.parquet'"
    doff = con.execute(
        f"SELECT max(doc_id) + 1 FROM {dsrc}").fetchone()[0]
    dparts = [f"SELECT * FROM {dsrc}"]
    for i in range(1, k):
        rot = _VOWEL_ROT[i % len(_VOWEL_ROT)]
        dparts.append(
            f"SELECT * REPLACE (doc_id + {i} * {doff} AS doc_id, "
            f"translate(text, 'aeiou', '{rot}') AS text) FROM {dsrc}")
    con.execute(f"COPY ({' UNION ALL '.join(dparts)}) "
                f"TO '{out}/documents.parquet' (FORMAT PARQUET)")
    open(f"{out}/_DONE", "w").write("ok")
    return out


def build_skew_corpus(k: int) -> str:
    """events-only corpus at k x sf0.1 volume with zipf keys."""
    import duckdb

    out = f"{WORK}/zipf{k}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    src = f"{build_corpus(k)}/events.parquet"
    con = duckdb.connect()
    # u, u2: deterministic uniforms in [0, 1) from md5(event_id) —
    # reproducible corpora, no RNG state
    con.execute(f"""
      COPY (
        SELECT * EXCLUDE (u, u2) REPLACE (
          CAST(pow(1.0 / (1.0 - u), {1.0 / SKEW_ALPHA}) AS BIGINT)
            % 100000 AS user_id,
          CASE WHEN u2 < {SKEW_HOT_TYPE_SHARE} THEN 'view'
               ELSE event_type END AS event_type)
        FROM (
          SELECT *,
            (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
               ::UBIGINT % 1048576) / 1048576.0 AS u,
            (('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'x'), 1, 8))
               ::UBIGINT % 1048576) / 1048576.0 AS u2
          FROM '{src}')
      ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    open(f"{out}/_DONE", "w").write("ok")
    return out


def _plain_rollup(spark, sf_dir):
    """Unsalted twin of events_skew_rollup (same DECIMAL accumulator,
    same output), for the salted-vs-plain comparison."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir).withColumn(
        "v", F.col("value").cast("decimal(18,6)"))
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("v").cast("double").alias("sum_value"))


def _plain_join(spark, sf_dir):
    """Unsalted twin of events_skew_join."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n_user_events"))
    return (
        ev.select("user_id", "event_type").join(dim, "user_id")
        .groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("n_user_events").cast("long").alias("sum_peer_events"))
    )


def run_skew_panel(out_path: str, multipliers=(1, 10)) -> None:
    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    dirs = {k: build_skew_corpus(k) for k in multipliers}
    print(f"zipf corpora ready: {list(dirs.values())}", flush=True)
    spark = get_spark("scaling-skew")
    # warm codegen for the agg/join machinery so the x1 cells don't
    # absorb JIT cost and make the larger multipliers look sublinear
    for w in (QUERIES["events_skew_rollup"], _plain_join):
        w(spark, dirs[multipliers[0]]).write.format("noop") \
            .mode("overwrite").save()
    import duckdb

    con = duckdb.connect()
    top = con.execute(
        f"SELECT user_id, COUNT(*) c FROM '{dirs[multipliers[-1]]}/"
        f"events.parquet' GROUP BY 1 ORDER BY c DESC LIMIT 1"
    ).fetchone()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{dirs[multipliers[-1]]}/events.parquet'"
    ).fetchone()[0]

    def timed(fn, sf_dir, **conf):
        prev = {c: spark.conf.get(c) for c in conf}
        for c, v in conf.items():
            spark.conf.set(c, v)
        try:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3)
        finally:
            for c, v in prev.items():
                spark.conf.set(c, v)

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    no_aqe_skew = {**no_bcast,
                   "spark.sql.adaptive.skewJoin.enabled": "false"}
    panel: dict = {
        "alpha": SKEW_ALPHA,
        "hot_type_share": SKEW_HOT_TYPE_SHARE,
        "hot_user_row_share_top_mult": round(top[1] / n, 4),
        "multipliers": list(multipliers),
        "note": ("salted vs plain twins on the SAME zipf corpus; "
                 "auto-broadcast disabled for all join variants (the "
                 "dim-too-big-to-broadcast scenario salting targets); "
                 "plain join measured with AQE skew-splitting on AND "
                 "off"),
        "interpretation": (
            "JOIN: salting pays a fixed fan-out tax, so it loses at "
            "small volume and wins as the hot key's absolute row "
            "count grows — the salted/plain ratio falls monotonically "
            "with the multiplier and crosses below 1 by x10; at 100 TB "
            "the hot key is orders of magnitude past the crossover. "
            "ROLLUP: salting an ASSOCIATIVE aggregation never wins — "
            "Catalyst's map-side partial aggregation already collapses "
            "the hot key per input partition, so the unsalted shuffle "
            "carries one row per (partition, key) regardless of skew; "
            "events_skew_rollup exists to keep the salted-agg path "
            "tested for NON-associative aggregates, and this panel is "
            "the measured evidence that plain partial-agg is the "
            "right default for associative ones."),
    }
    for k in multipliers:
        d = dirs[k]
        panel[f"rollup_salted_t{k}"] = timed(
            QUERIES["events_skew_rollup"], d)
        panel[f"rollup_plain_t{k}"] = timed(_plain_rollup, d)
        panel[f"join_salted_t{k}"] = timed(
            QUERIES["events_skew_join"], d, **no_bcast)
        panel[f"join_plain_aqe_t{k}"] = timed(
            _plain_join, d, **no_bcast)
        panel[f"join_plain_noaqe_t{k}"] = timed(
            _plain_join, d, **no_aqe_skew)
        print(f"x{k}: " + ", ".join(
            f"{key}={panel[key]}" for key in panel
            if key.endswith(f"_t{k}")), flush=True)
    tk = multipliers[-1]
    for fam in ("rollup", "join"):
        plain_key = (f"{fam}_plain_t{tk}" if fam == "rollup"
                     else f"{fam}_plain_noaqe_t{tk}")
        panel[f"{fam}_salted_over_plain_x{tk}"] = round(
            panel[f"{fam}_salted_t{tk}"] / panel[plain_key], 3)
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            doc = json.load(fh)
    doc["skew"] = panel
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"skew_panel": panel}), flush=True)


# ------------------------------------------------ lineage-posture panel
# What does the cluster posture COST locally? The r8 lineage.cut
# switch trades localCheckpoint (lineage truncated, executor-local)
# for persist(MEMORY_AND_DISK)+count (lineage kept, recompute on
# loss). This panel times the most cut-heavy iterative queries at 10x
# under both postures so the trade is a measured number, not a claim.
LINEAGE_PANEL = ["pagerank_parts", "community_lpa", "dedup_components",
                 "bpe_train_merges", "kcore_census", "graph_bfs_reach"]
# the deep iterative loops whose RELIABLE write cost must also be
# known at 2x the panel volume (r8 verdict item 4: does the
# checkpoint tax grow with data, and when does it amortize?)
LINEAGE_X20 = ["pagerank_parts", "community_lpa", "dedup_components",
               "kcore_census"]


def run_lineage_panel(out_path: str, mults: tuple = (10, 20)) -> None:
    from distributed_system_mapreduce_spark import lineage
    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    dirs = {m: build_corpus(m) for m in mults}
    spark = get_spark("scaling-lineage")
    # warm codegen on the first panel member before timing anything
    QUERIES[LINEAGE_PANEL[0]](spark, dirs[mults[0]]) \
        .write.format("noop").mode("overwrite").save()

    def drop_state() -> None:
        spark.catalog.clearCache()
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    def timed(name: str, mode: str, d: str) -> float:
        spark.conf.set(lineage.CONF_KEY, mode)
        try:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                drop_state()
            return round(best, 3)
        finally:
            spark.conf.set(lineage.CONF_KEY, "local")

    base = mults[0]
    panel: dict = {"multiplier": base, "multipliers": list(mults),
                   "queries": {}}
    for name in LINEAGE_PANEL:
        # base multiplier: all three postures (persist included — the
        # deep-loop plan-growth evidence)
        row = {}
        for mode in ("local", "persist", "reliable"):
            row[f"t_{mode}"] = timed(name, mode, dirs[base])
        for mode in ("persist", "reliable"):
            row[f"{mode}_over_local"] = round(
                row[f"t_{mode}"] / row["t_local"], 3)
        # larger multipliers: local vs reliable only (persist is
        # already established as the wrong deep-loop posture; x20
        # persist would burn ~10 min per query re-proving it)
        for m in mults[1:]:
            if name not in LINEAGE_X20:
                continue
            for mode in ("local", "reliable"):
                row[f"t_{mode}_x{m}"] = timed(name, mode, dirs[m])
            row[f"reliable_over_local_x{m}"] = round(
                row[f"t_reliable_x{m}"] / row[f"t_local_x{m}"], 3)
        panel["queries"][name] = row
        print(f"{name}: {row}", flush=True)
    for mode in ("persist", "reliable"):
        rs = sorted(r[f"{mode}_over_local"]
                    for r in panel["queries"].values())
        panel[f"median_{mode}_over_local"] = rs[len(rs) // 2]
    for m in mults[1:]:
        rs = sorted(r[f"reliable_over_local_x{m}"]
                    for r in panel["queries"].values()
                    if f"reliable_over_local_x{m}" in r)
        if rs:
            panel[f"median_reliable_over_local_x{m}"] = rs[len(rs) // 2]
    panel["note"] = (
        "three postures on the x10 corpus (one warm session, "
        "best-of-2, caches cleared between runs), plus local-vs-"
        "reliable on the x20 corpus for the four deep graph/CC loops. "
        "persist (lineage KEPT) is safe "
        "recovery for shallow cuts but catastrophically wrong for deep "
        "iterative loops — round N's plan nests all prior rounds, so "
        "Catalyst analysis grows per round (kcore_census measured 35x "
        "under persist). reliable (checkpoint to the session's "
        "checkpoint dir: lineage truncated AND loss-survivable) is the "
        "cluster posture for iterative operators; its tax over "
        "localCheckpoint is the reliable-storage write, which on this "
        "single box is local disk — on a cluster, point "
        "spark.graft.checkpointDir at HDFS/S3 and the tax is one "
        "replicated write per cut. The x10-vs-x20 reliable/local "
        "ratios show whether that write tax grows with volume or "
        "amortizes against the per-round compute.")
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            doc = json.load(fh)
    doc["lineage_posture"] = panel
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"lineage_panel": panel}), flush=True)


def write_doc(out_path: str, multipliers, results: dict,
              merge_queries: bool) -> None:
    """Read-modify-write SCALING.json: EVERY write path preserves
    foreign top-level panels (skew, lineage_posture, ...) — the r8
    full-run write path dumped a fresh doc and destroyed both
    measured panels (VERDICT r8 item 2)."""
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            doc = json.load(fh)
    if merge_queries:
        # spot re-run: merge the fresh rows into the existing artifact.
        # Stale rows predating per-row multipliers get stamped with the
        # prior artifact's top-level list so the merge never mixes
        # semantics silently (ADVICE r5).
        prior = doc.get("queries", {})
        prior_mult = doc.get("multipliers", list(MULTIPLIERS))
        for r in prior.values():
            r.setdefault("multipliers", list(prior_mult))
        prior.update(results)
        results = prior
    doc.update({"base": BASE, "multipliers": list(multipliers),
                "floor_sec": FLOOR_SEC, "queries": results})
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)


def main() -> None:
    argv = sys.argv[1:]
    multipliers = MULTIPLIERS
    if argv and argv[0] == "--lineage":
        run_lineage_panel(argv[1] if len(argv) > 1
                          else os.path.join(REPO, "SCALING.json"))
        return
    if argv and argv[0] == "--skew":
        run_skew_panel(argv[1] if len(argv) > 1
                       else os.path.join(REPO, "SCALING.json"),
                       multipliers=(1, 10, 20))
        return
    if argv and argv[0] == "--mult":
        multipliers = tuple(int(x) for x in argv[1].split(","))
        argv = argv[2:]
    out_path = argv[0] if argv else os.path.join(REPO, "SCALING.json")
    subset = argv[1:]
    under_test = subset or QUERIES_UNDER_TEST
    unknown = [n for n in under_test if n not in QUERIES_UNDER_TEST]
    if unknown:
        raise SystemExit(f"not in QUERIES_UNDER_TEST: {unknown}")
    dirs = {k: build_corpus(k) for k in multipliers}
    print(f"corpora ready: {list(dirs.values())}", flush=True)

    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    spark = get_spark("scaling")
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop") \
        .mode("overwrite").save()

    def drop_persisted() -> None:
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    results: dict[str, dict] = {}
    for name in under_test:
        fn = QUERIES[name]
        # every row records the multipliers IT was measured under, so
        # merged artifacts stay self-describing (fresh and stale rows
        # can legitimately differ after a --mult spot run)
        row: dict = {"multipliers": list(multipliers)}
        try:
            for k in multipliers:
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, dirs[k]).write.format("noop") \
                        .mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    drop_persisted()
                row[f"t{k}"] = round(best, 3)
            for k in multipliers[1:]:
                # subtract the fixed local floor so tiny queries don't
                # report flat "ratios" that just measure overhead
                num = max(row[f"t{k}"] - FLOOR_SEC, 0.001)
                den = max(row["t1"] - FLOOR_SEC, 0.001)
                row[f"ratio{k}"] = round(num / den, 2)
            top = multipliers[-1]
            row["superlinear"] = row[f"ratio{top}"] > top * 1.8
        except Exception as exc:
            row["error"] = f"{type(exc).__name__}: {exc}"[:200]
        if name in OUTPUT_BOUND_NOTES:
            row["note"] = OUTPUT_BOUND_NOTES[name]
        results[name] = row
        print(f"{name}: {row}", flush=True)

    write_doc(out_path, multipliers, results, merge_queries=bool(subset))
    bad = [n for n, r in results.items() if r.get("superlinear")]
    print(json.dumps({"scaling_ok": not bad, "superlinear": bad}))


if __name__ == "__main__":
    main()
