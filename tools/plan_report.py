"""Generate PLANS.md: formatted physical plans for representative
queries, so plan quality (pushdown, broadcasts, partial aggregation,
codegen spans, no global windows) is inspectable without running
Spark. Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SHOWCASE = [
    ("gossip_dissemination",
     "bounded-round gossip: per-round explode+distinct over the "
     "roster behind lineage cuts; 13-row summary via self-join, "
     "no global window"),
    ("failure_detection_census",
     "staleness rule: one lag-window partitioned by node, then "
     "partial-agg rollup"),
    ("membership_lww_merge",
     "LWW merge: per-slot top-1 (WindowGroupLimit below the "
     "exchange) + partial-agg counts, one shuffle key"),
    ("replica_rebalance_census",
     "ring placement: per-arc rank + stitched 256-arc offsets "
     "(metadata), successor index from file x own-arc nodes only, "
     "one ring_index equi-join; no global window"),
    ("scd2_rate_join",
     "SCD-2 as-of bucketized: broadcast fill-forward grid, fact side "
     "pays broadcast hash joins only, one agg exchange"),
    ("ann_topk_same_label",
     "filtered vector search: label as join key + WindowGroupLimit "
     "partial top-k before the exchange"),
    ("dedup_components_incremental",
     "delta-bounded CC: probe edges contract through broadcast "
     "standing labels; the iterative loop sees only the contracted "
     "graph"),
    ("events_sessionize_incremental",
     "boundary stitch: one window per partition side, state side "
     "reduced to a per-user aggregate before the join"),
    ("label_centroid_margin",
     "quantized-centroid broadcast + per-vec assignment window "
     "(never global)"),
    ("embedding_cov_topk",
     "in-array pair Generate (DIM choose 2, no self-join) + bounded "
     "dim-pair grid + TakeOrdered"),
    ("bpe_compression_curve",
     "per-round cut barriers: each curve point a 1-row agg, no round "
     "replay"),
    ("q6_forecast_revenue", "filter pushdown + column pruning"),
    ("q5_local_supplier", "6-way join: dims broadcast, facts shuffle"),
    ("q1_pricing_summary", "map-side partial aggregation"),
    ("q15_top_supplier", "global top-1 as TakeOrderedAndProject"),
    ("dedup_minhash", "codegen'd signature agg + checkpointed band self-join"),
    ("ann_topk_ivf", "broadcast codebook + cell-bucketed candidates"),
    ("events_asof_order", "as-of join as union + keyed window"),
    ("purchase_attribution", "range join bucketized to a hash equi-join"),
    ("mr_wordcount", "Arrow-batched engine path (MapInPandas)"),
    ("contamination_check",
     "broadcast benchmark vocab + explode_outer re-agg"),
    ("mix_rebalance_sample",
     "derived per-source cutoffs broadcast onto a narrow hash filter"),
    ("repetition_score", "doc-keyed two-level bigram agg, map-side combine"),
    ("curation_pipeline",
     "end-to-end pipeline: single scan, broadcast dup labels, one "
     "partial-agg exchange"),
    ("cross_source_overlap",
     "per-source min-sketch partial agg + broadcast pairwise stage"),
    ("dedup_substring",
     "window fingerprints: linear annotation, no pairwise join"),
    ("events_anomaly", "integer moments + broadcast join-back z-scores"),
    ("mr_wordcount_exe",
     "external-process maple/juice via MapInPandas (subprocess per "
     "partition / per key)"),
    ("ann_topk_brute",
     "bounded baseline: constant query panel broadcast into a "
     "nested-loop join"),
    ("ann_topk_lsh",
     "banded sign-LSH: checkpointed index store, per-band bucket "
     "equi-joins, distinct candidates, cosine re-rank"),
    ("events_retention",
     "cohort matrix: ONE user_id shuffle (collect_set weeks), no "
     "join-back"),
    ("events_sliding_window",
     "hopping windows: native window() fan-out, one partial-agg "
     "exchange"),
    ("rare_token_rate",
     "vocab rollup -> percentile threshold -> broadcast rare set "
     "onto the token stream"),
    ("events_skew_rollup",
     "two-phase salted aggregation: (key, salt) partial then key "
     "merge"),
    ("basket_pairs",
     "orderkey-bounded self-join co-occurrence + TakeOrdered top-k"),
    ("events_dau_wau",
     "rolling distinct: distinct pairs x covering-days explode, "
     "never a windowed count-distinct"),
    ("token_budget_sample",
     "per-source budgets broadcast + source-partitioned prefix sums"),
    ("pagerank_parts",
     "iterative graph rounds unrolled: single checkpointed edge+deg "
     "table, one BROADCAST rank join + partial agg per round (edges "
     "never re-shuffle), node count inlined as a literal, integer "
     "ranks"),
    ("triangle_count",
     "support-filtered edges checkpointed; wedge join + closure "
     "probe; three broadcast 1-row aggs"),
    ("dedup_incremental",
     "delta-vs-index band probe: one checkpointed band table, "
     "new x corpus equi-join only"),
    ("pack_chunks",
     "(source, shard)-partitioned running-offset window, two-level "
     "integer rollup"),
    ("bigram_lift",
     "counts shuffles + TakeOrdered-30 first, lift arithmetic on the "
     "broadcast 30-row side"),
    ("profile_orders",
     "per-column pruned scans (single-field ReadSchema per union "
     "branch), plain two-phase distincts, no multi-distinct Expand"),
    ("events_ohlc",
     "row_number open/close markers partitioned (day, type), single "
     "partial-agg rollup"),
    ("orders_backlog",
     "exact global running sum: year-partitioned cumsum windows "
     "stitched by O(#years) driver offsets"),
    ("training_batches_digest",
     "token stream placed by doc-level offset window + posexplode; "
     "per-sequence bounded collect_list"),
    ("events_streaks",
     "gaps-and-islands: user-partitioned row_number islands, two "
     "partial-agg rollups"),
    ("events_rolling_median",
     "user-partitioned bounded rows-frame window (10-double state "
     "per row), sorted-frame midpoint arithmetic"),
    ("vocab_growth",
     "per-doc distinct shingles before explode, two partial-agg "
     "shuffles, triangular broadcast prefix-sum over bucket rows"),
    ("orders_mom_growth",
     "month rollup once, broadcast self-join on month_key-1 for the "
     "lag — no global window over the calendar"),
    ("chunk_overlap",
     "closed-form integer chunk arithmetic per doc (no explode), one "
     "bounded-key partial agg"),
    ("lang_confusion",
     "one corpus scan -> bounded cell matrix; per-true shares via a "
     "window partitioned over the tiny matrix"),
    ("embedding_quantize",
     "narrow JVM array folds per vector, 1e-9-grid integer sums, one "
     "bounded-label partial agg"),
    ("join_size_estimate",
     "per-key count tables + key-count equi-join — sizes the "
     "fact-fact join without executing it"),
    ("gopher_rules",
     "five rules over ONE materialized token array, integer "
     "cross-product predicates, bounded-source agg"),
    ("shard_assignment",
     "(size class x salt) partitioned windows + broadcast exclusive "
     "prefix — balanced dealing, no low-cardinality window"),
    ("kmv_distinct",
     "salted two-phase bottom-K (per-salt rank then per-source rank "
     "over <= SALTS*K survivors), codegen'd conv() hash decode"),
    ("bloom_semi_filter",
     "bit_or partial agg -> one dense word array broadcast into the "
     "fact scan; probe is scalar codegen, no fact shuffle"),
    ("events_concurrency",
     "+1/-1 delta sweep: (type, day)-partitioned cumsum + broadcast "
     "exclusive day prefix, broadcast argmax filter"),
    ("cdc_apply",
     "last-writer-wins as ONE max(struct) partial agg per key — no "
     "window over the change log"),
    ("skyline_parts",
     "per-price collapse + bucket-stitched strict prefix max, "
     "broadcast level table onto the part scan"),
    ("winsorized_stats",
     "exact array-percentile per bounded group, cutoffs broadcast "
     "onto an un-shuffled scan, DECIMAL interior sum"),
    ("events_twap",
     "user-partitioned lead window, DECIMAL integral, "
     "quotient-split before the one double division"),
    ("fuzzy_name_pairs",
     "q-gram blocking equi-join + length filter, levenshtein "
     "verify on candidates only"),
    ("ann_incremental",
     "delta x standing band index equi-join, cosine re-rank — "
     "never corpus x corpus"),
    ("community_lpa",
     "3 unrolled LPA rounds off one checkpointed edge table; vote "
     "argmax as min(struct) partial agg, no vote window"),
    ("source_hhi",
     "one token rollup, HHI on the bounded (lang, source) table in "
     "exact integers, quotient-split divisions"),
    ("events_drift",
     "one bucketed scan -> bounded (type, half, bucket) rollup; TVD "
     "in exact integer DECIMAL, one division per type"),
    ("freq_items_sketch",
     "Arrow-batched Misra-Gries partials (<= K counters/partition), "
     "summary-sized shuffle, TakeOrdered final"),
    ("link_prediction",
     "strong-edge wedge join + left-anti vs existing edges, "
     "TakeOrdered top-k"),
    ("k_anonymity",
     "two-phase exact distinct per release cell, bounded type "
     "rollup"),
    ("graph_degree_dist",
     "co-purchase pairs expanded IN-ARRAY per order (no order-key "
     "self-join), then two bounded partial aggs"),
    ("revenue_gini",
     "exact global ranks via range-partitioned row_number + "
     "broadcast O(#partitions) offsets, integer-cent Gini"),
    ("user_survival_km",
     "per-user partial agg -> bounded day grid, triangular "
     "broadcast at-risk counts, strict-fold survival product"),
    ("minhash_containment",
     "shared one-pass minhash+shingle store, LSH bucket candidates, "
     "array_intersect containment on candidates only"),
    ("hard_negative_mining",
     "banded-LSH index store, label-mismatch bucket join, per-query "
     "min(struct) argmax — no all-pairs"),
    ("events_holt_forecast",
     "sequential smoother as a bounded day-sorted array fold — one "
     "partial-agg shuffle feeds a per-type fold"),
    ("lsh_param_sweep",
     "one checkpointed signature store; each banding derives its "
     "band table by projection and pays one bucket self-join"),
    ("embedding_margin",
     "grid-exact centroids broadcast (bounded fan-out), per-vector "
     "bounded sort for nearest-two, TakeOrdered top-k"),
    ("decayed_popularity",
     "dyadic decay weights + ordered fold (exact exponential sum)"),
    ("revenue_trend_ols",
     "exact BIGINT normal equations, dims broadcast"),
    ("events_throttle",
     "keep-if-gap fold over per-user sorted arrays"),
    ("late_arrival_census",
     "bucketed prefix-MAX stitch, broadcast offsets"),
    ("bootstrap_ci",
     "x32 resample explode on the bounded day grid, percentile band"),
    ("weighted_median_price",
     "value-grid cumsum + triangular broadcast bucket prefix"),
    ("ann_maxsim",
     "broadcast query-token panel, per-token max agg, token-ordered fold"),
    ("hybrid_rank_fusion",
     "RRF of two TakeOrdered rankers (bounded fusion join)"),
    ("snippet_extract",
     "per-row array algebra, no Generate, TakeOrdered finish"),
    ("dedup_components_star",
     "alternating large-star/small-star CC rounds"),
    ("dsir_importance",
     "hashed-unigram importance weights: two partial-agg models "
     "broadcast back, deterministic-ln sqrt chains in codegen, "
     "sorted-fold per-doc sums"),
    ("doc_lm_typicality",
     "corpus char-bigram LM cross-entropy: one bigram explode, "
     "broadcast model join, sorted-fold per-doc entropy"),
    ("q2_best_supplier",
     "pair dedup ABOVE the selective broadcast filters (r3 fix: the "
     "dedup exchange carries the filtered slice, not full lineitem)"),
    ("late_arrival_census",
     "fixed 4096-bucket arrival grid sized by a 1-row max agg; "
     "cross-bucket prefix-max as a window over the bucket aggregate "
     "(r3 fix: no driver-side stitch)"),
    ("token_js_divergence",
     "hashed-vocab split divergence: bounded 256-bucket grid, "
     "broadcast per-source totals, sorted-fold JS sum"),
    ("user_markov_entropy",
     "per-user transition cells via user-partitioned lead window, "
     "entropy fold over the bounded cell list"),
    ("zipf_exponent",
     "per-source rank window over the Heaps-sublinear vocab, four "
     "sorted folds over the constant 64-row head"),
    ("events_changepoint",
     "calendar-bounded prefix window + broadcast totals, min(struct) "
     "argmax — binary-segmentation split with no transcendentals"),
    ("t_closeness",
     "cell x bucket grid with broadcast margins, sorted-fold TVD"),
    ("filestore_bucketed_join",
     "bucketed catalog tables: bucket-to-bucket sort-merge join, the "
     "ONLY Exchange is the final partial-agg's"),
    ("filestore_zorder_pruned",
     "manifest-driven file skipping: surviving-file scan + residual "
     "box filter, metadata-sized manifest read"),
    ("mr_contact_trace",
     "interval overlap as a bucketized equi-join — never an "
     "unbounded inequality join"),
    ("ann_recall_eval",
     "three existing ANN plans (brute gold, LSH, IVF) composed into "
     "exact-integer recall aggregates over the 64-query panel"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from distributed_system_mapreduce_spark.plans import formatted_plan
    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    spark = get_spark("plan_report")
    out = ["# PLANS — formatted physical plans (generated by "
           "tools/plan_report.py)\n"]
    for name, why in SHOWCASE:
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        out.append(f"\n## {name} — {why}\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
