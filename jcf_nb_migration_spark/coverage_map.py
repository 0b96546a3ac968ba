"""Driver-window coverage map (VERDICT r4 item 8).

The external driver hard-checks only the first 50 (alphabetical)
contract queries, so the non-window remainder of the registry (see COVERAGE.md
for the current count) is marked
``driver_visible=False``.  Every local-only query still runs against
its exact DuckDB oracle in tests/test_query_oracles.py; this map
additionally records, for each one, WHICH driver-visible query
exercises the same *physical* plan pattern — so the driver's 50-query
window transitively witnesses every shuffle/join/window shape in the
repo, not just the 50 names it reruns.

Values are either the name of a driver-visible query, or a
``"pytest:<reason>"`` marker for the handful of surfaces that have no
visible twin by nature (custom Python data sources, stateful
streaming, the two-phase prefix sum) and are instead pinned by
dedicated pytest plan/behavior tests.  tests/test_coverage_map.py
asserts the keys are exactly the local-only registry names and every
non-pytest value is a driver-visible query.
"""

from __future__ import annotations

# local-only query -> driver-visible query with the same physical
# pattern (or "pytest:<which test pins it>").
COVERED_BY: dict[str, str] = {
    # --- ANN / similarity ------------------------------------------------
    # bucket/cluster-shortlist equi-join + per-probe ranking window:
    "ann_lsh_batch_probes": "hard_negative_mining_ann",
    "ann_lsh_bucketed": "hard_negative_mining_ann",
    "ann_lsh_multiprobe": "hard_negative_mining_ann",
    "ivf_ann_multiprobe": "hard_negative_mining_ann",
    "ivf_ann_probe": "hard_negative_mining_ann",  # cluster-shortlist probe + rank window
    "knn_label_propagation": "hard_negative_mining_ann",
    "hard_negative_mining": "hard_negative_mining_ann",
    "pq_codes": "ivfpq_residual_codes",  # same PQ encode projection
    # ivfadc_residual_multiprobe rotated INTO the driver window r9
    # (second wave), superseding ivfadc_residual_probe:
    "ivfadc_residual_probe": "ivfpq_residual_codes",  # same residual-PQ
    #   code machinery (probe shortlist shape: hard_negative_mining_ann)
    "triplet_mining_ann": "hard_negative_mining_ann",  # same candidate
    #   generator, positive+negative windows joined
    "embedding_quantize_int8": "ivfpq_residual_codes",  # same quantize-encode projection
    # quantized_rerank_topk rotated INTO the driver window r9
    "late_interaction_rerank": "late_interaction_served",  # same MaxSim
    #   shortlist + bounded rerank, ad-hoc scan vs served index
    "embedding_norm_stats": "hard_negative_mining_ann",
    "embedding_normalize": "hard_negative_mining_ann",
    # record_linkage_merge rotated INTO the driver window r9 (second
    # wave), superseding fuzzy_name_matches as the blocking witness:
    "fuzzy_name_matches": "record_linkage_merge",
    "part_name_fuzzy_pairs": "record_linkage_merge",  # blocked fuzzy
    #   pair join (deletion-key blocking + edit-distance verify)
    # --- dedup -----------------------------------------------------------
    # dedup_clusters_lsh rotated OUT in the r9 second wave (green
    # r2-r8); the iterative contraction engine stays visible via the
    # certified-CC queries:
    "dedup_clusters_lsh": "linkgraph_bfs_reachability",  # same iterative
    #   frontier-equi-join fixpoint engine (functions/graph.py) over
    #   LSH-band edges instead of linkgraph edges
    "dedup_clusters": "linkgraph_bfs_reachability",  # same engine, exact
    #   all-pairs edges
    # linkgraph_cc_starcontraction rotated INTO the driver window r7
    "dedup_ngram_jaccard": "lsh_incremental_dedup",
    "doc_containment_pairs": "lsh_incremental_dedup",  # rare-shingle
    #   candidate equi-join + full-set verify, asymmetric metric
    # paragraph_dedup rotated INTO the driver window r7
    "minhash_signatures": "lsh_incremental_dedup",
    # lsh_incremental_dedup rotated INTO the driver window r9
    # bloom_incremental_dedup rotated INTO the driver window r7
    "doc_fingerprint": "simhash_fingerprints",  # per-doc fingerprint projection over the same tokenized scan
    "source_dedup_matrix": "simhash_fingerprints",
    # --- text / curation -------------------------------------------------
    # bpe_merge_table / doc_bpe_stats rotated OUT in the r9 second
    # wave (green r3-r8); the BPE trainer loop is pinned by
    # tests/test_text_bpe.py and the text-family scans stay visible:
    "bpe_merge_table": "association_rules_pairs",  # vocabulary/pair-keyed
    #   aggregate + join chain (the trainer's per-round pair counts)
    "doc_bpe_stats": "doc_subword_stats",
    "corpus_vocabulary": "doc_subword_stats",
    # doc_subword_stats rotated INTO the driver window r10 4th wave,
    # superseding doc_token_stats as the token-explode witness:
    "doc_token_stats": "doc_subword_stats",
    "doc_winnow_fingerprints": "doc_subword_stats",
    "doc_bigram_lm_score": "corpus_novelty_curve",
    # token_pmi_pairs rotated INTO the driver window r9
    # gopher_quality_flags rotated INTO the driver window r9
    # logreg_gd_training rotated OUT in the r9 second wave (green
    # r5-r8); the iterative fixed-point-aggregate loop stays visible
    # via linkgraph_pagerank:
    "logreg_gd_training": "linkgraph_pagerank",  # per-round
    #   map-side-combinable aggregate + bounded driver state update
    "logreg_calibration": "gopher_quality_flags",  # one codegen'd
    #   per-doc scoring scan (hashed-feature dot product, no shuffle)
    "doc_lang_id": "doc_subword_stats",
    "code_switch_profile": "doc_subword_stats",  # chunk explode +
    #   per-doc lang-mix rollup (paragraph_dedup's shuffle graph)
    "doc_repetition_stats": "corpus_novelty_curve",  # gram-explode agg
    #   (rotated out of the window r5 for logreg_gd_training)
    "curation_funnel": "doc_subword_stats",  # staged narrow
    #   quality filters over the same per-doc stats scan
    "corpus_release_report": "corpus_novelty_curve",  # dataset-card
    #   rollup: shared base + four 1-row aggregates crossJoined; the
    #   heavy branch is decontaminate's n-gram equi-join
    # curation_pipeline_e2e rotated OUT in the r9 second wave (green
    # r6-r8); every stage stays individually visible:
    "curation_pipeline_e2e": "weighted_corpus_sample",
    "source_quota_cap": "term_source_dispersion",  # term-keyed rollup + top-k-per-key window
    # semdedup_prune rotated OUT in the r9 second wave (green r4-r8):
    "semdedup_prune": "lsh_incremental_dedup",  # standing-index
    #   candidate shortlist + per-doc keep/drop verdict
    "cluster_balanced_sample": "weighted_corpus_sample",
    "cluster_topic_terms": "weighted_corpus_sample",

    # --- retrieval -------------------------------------------------------
    # bm25_top_docs rotated INTO the driver window r7
    # rrf_fusion rotated INTO the driver window r7
    # positional retrieval (r9): term-filtered postings + bounded
    # positional self-join — the term-keyed probe family
    # phrase_match_served / bm25_filtered_served / doc_fetch_served
    # rotated INTO the driver window r9 (second wave)
    "phrase_match_docs": "proximity_ranked_served",  # ad-hoc scan twin
    #   of the served positional probes (same positional join)
    # --- corpus assembly / sampling --------------------------------------
    "corpus_global_shuffle": "weighted_corpus_sample",  # same deterministic-hash row assignment over the corpus scan
    "stratified_sample": "weighted_corpus_sample",
    "dsir_importance": "weighted_corpus_sample",  # deterministic weighted selection over the same per-doc score scan
    "source_sampling_weights": "weighted_corpus_sample",
    "doc_chunk_overlap": "arrow_doc_stats",  # per-row fan-out
    #   (posexplode grid) + bounded rollup
    "packing_efficiency_report": "arrow_doc_stats",  # const
    #   grid explode + small groupBy rollup
    # --- profiling / sketches -------------------------------------------
    "customer_column_profile": "join_key_skew_profile",
    "k_anonymity_audit": "join_key_skew_profile",  # grouped-count distribution rollup, same profile-agg plan
    "user_active_streaks": "user_rolling_7d",  # user-keyed ordered
    #   window (lag/cumsum islands)
    "session_conversion_funnel": "session_window_counts",  # lag/cumsum
    #   sessionization + staged event-time rollups
    "dq_expectations": "join_key_skew_profile",  # bounded per-check aggregates unioned into one report frame
    "referential_integrity_audit": "sole_failing_supplier",
    "daily_volume_anomalies": "join_key_skew_profile",
    "benford_first_digit": "join_key_skew_profile",
    "source_embedding_drift": "pricing_summary",  # group agg over a
    #   pushed-filter scan + broadcast scalar compare
    "source_report_card": "pricing_summary",  # multi-branch
    #   aggregate rollup over one shared scan
    "price_histogram": "winsorized_order_values",  # value-bucket/rank
    #   assignment + bounded-grid count rollup
    "quantity_price_correlation": "pricing_summary",  # scan-agg moments
    #   (sum/sumsq/cross) in one pass
    "daily_new_users": "user_rolling_7d",  # user-keyed min-date
    #   window + date rollup
    "promo_session_attribution": "orders_pit_customer_join",  # session
    #   intervals x broadcast promo calendar overlap join + as-of
    #   attribution pick — the time-band/PIT pair-join family
    # --- relational / TPC-H shapes --------------------------------------
    # r7 rotation: six 5-6x-green incumbents OUT (history preserved in
    # CORRECTNESS_r1-r6) to admit the never-checked families above.
    "orderdate_us_format": "gopher_quality_flags",  # positional substring
    #   + concat derived column (C5/C6) — chained string-op projection
    "customer_account_flags": "gopher_quality_flags",  # when/otherwise
    #   masked assignment + membership/equality filters (F5/F6/C11)
    "part_merge_chain": "gopher_quality_flags",
    # part_clean_chain rotated OUT r10 4th wave (green r1-r9); the
    # codegen'd regex/when-otherwise projection chain stays visible
    # via gopher_quality_flags:
    "part_clean_chain": "gopher_quality_flags",  # codegen'd regex +
    #   when/otherwise projection chain over one table, no shuffle
    "salted_user_totals": "user_rolling_7d",  # explicit-salt
    #   two-phase agg on the same events keys; AQE skew twin pinned in
    #   tests/test_plans.py::test_aqe_splits_skewed_join
    "pii_scrub_stats": "gopher_quality_flags",  # regex-replace narrow
    #   projection; plan pinned by test_plans::test_pii_scrub_is_narrow
    "mktsegment_distinct": "hll_sketch_union",  # distinct-value family; HLL is the sketched twin of exact distinct
    "customers_with_urgent_orders": "sole_failing_supplier",  # left-semi existence join (q21 is the semi+anti composite)
    "customers_without_orders": "idle_rich_customers",  # left-anti non-existence join (q22 is the anti+scalar composite)
    "high_balance_never_fulfilled": "idle_rich_customers",  # EXCEPT compiles to the same left-anti shape
    "discounted_brand_revenue": "nation_trade_volume",
    # nation_trade_volume rotated INTO the driver window r10 4th wave,
    # superseding local_supplier_volume as the broadcast-dim star-join
    # + group-agg witness (Q5/Q7 family):
    "local_supplier_volume": "nation_trade_volume",  # broadcast-dim
    #   star join + group agg (Q5 vs Q7, same physical family)
    "regional_customer_distribution": "nation_trade_volume",
    "top_supplier_revenue": "nation_trade_volume",  # broadcast-dim
    #   join + agg + top-k (Q15 family)
    "promo_revenue_share": "top_revenue_customers",
    "profit_by_nation_year": "nation_trade_volume",  # same star-join
    #   + broadcast-dim graph, regex dim filter pushed to the part scan
    "important_supplier_share": "nation_trade_volume",  # star join + share-of-total agg
    "part_supplier_variety": "hll_sketch_union",  # count-distinct rollup; HLL is its mergeable approximation
    "lateral_top_customers": "user_rolling_7d",  # decorrelated
    #   lateral = per-key ranked take (window twin)
    "nullsafe_cohort_compare": "top_revenue_customers",
    "customer_set_ops": "idle_rich_customers",  # INTERSECT/EXCEPT compile to semi/anti joins on the same keys
    "small_quantity_revenue": "top_revenue_customers",  # filtered
    #   join + scalar agg (Q17 family)
    # top_revenue_customers rotated INTO the driver window r10 4th
    # wave, superseding returned_item_report as the join + agg +
    # global-top-k witness (Q10 family):
    "returned_item_report": "top_revenue_customers",
    "priority_shipmode_report": "top_revenue_customers",  # filtered
    #   orders⋈lineitem join + small group agg (was covered by
    #   late_shipment_priority_count before its r6 rotation out)
    "late_shipment_priority_count": "sole_failing_supplier",  # semi join with extra non-equi residual, same existence pattern
    "supplier_nation_directory": "nation_trade_volume",  # broadcast
    #   dim equi-join + projection/rename — rotated OUT r6
    "order_status_pivot": "nation_metrics_unpivot",  # pivot = the same
    #   grouping-sets/EXPAND plan family as cube
    "part_brand_type_rollup": "nation_metrics_unpivot",  # ROLLUP
    #   grouping-sets (EXPAND) family
    # nation_metrics_unpivot rotated INTO the driver window r10 4th
    # wave, superseding lineitem_cube as the grouping-sets/reshape
    # (EXPAND) witness:
    "lineitem_cube": "nation_metrics_unpivot",  # grouping-sets/reshape
    #   (EXPAND) family: cube vs unpivot of the same wide agg
    "order_value_ranks": "user_rolling_7d",  # keyed ordered window
    "cohort_ltv_curve": "user_rolling_7d",  # cohort attribution
    #   + grid-bounded per-cohort running sum
    "user_running_value": "user_rolling_7d",  # per-user running frame
    #   (ROWS cumulative vs RANGE rolling, same window exchange)
    "incremental_agg_merge": "pricing_summary",  # partial-agg
    #   union + merge groupBy of the same scan-agg
    "retractable_agg_merge": "pricing_summary",  # signed-partial
    #   union + merge groupBy (incremental_agg_merge with retraction)
    # corpus_novelty_curve rotated INTO the driver window r10 4th
    # wave, superseding decontaminate_ngrams as the shingle-explode +
    # agg/join witness (decontaminate stays bench-measured):
    "decontaminate_ngrams": "corpus_novelty_curve",
    "event_sequence_pattern": "user_rolling_7d",  # per-key
    #   ordered collect + codegen'd regex
    # --- CDC / temporal --------------------------------------------------
    "orders_upsert": "orders_pit_customer_join",  # keyed CDC merge-latest over the same orders feed the PIT join consumes
    "orders_snapshot_diff": "orders_pit_customer_join",  # full-outer keyed compare of the same CDC snapshots the PIT join versions
    # r10: docstore time travel — build/COW/bucketed-fetch machinery is
    # the visible docstore_upsert_fetch; the manifest AS-OF read path
    # and the version-diff full-outer compare are additionally pinned
    # by tests/test_timetravel.py
    "scalar_iter_doc_stats": "doc_subword_stats",  # SCALAR_ITER pandas
    #   UDF surface; same per-doc stat output as the built-in path
    "volume_shipping_report": "nation_trade_volume",  # Q7: the
    #   broadcast-dim star join with nation joined twice
    # large_volume_customers rotated INTO the driver window r9
    # (second wave). Q18 notes kept for history:
    # Q18:
    #   agg-subquery semi-join + re-aggregate
    "regional_min_balance_supplier": "nation_trade_volume",  # Q2:
    #   correlated scalar-MIN decorrelated to a min-per-group
    #   join-back over broadcast bounded dims
    # --- events / time series -------------------------------------------
    "events_hourly": "streaming_interval_join",  # batch event-time agg; the streamed event-time shape stays visible here
    # user_rolling_7d rotated INTO the driver window r10 4th wave,
    # superseding latest_event_per_user as the per-user event-time
    # window witness:
    "latest_event_per_user": "user_rolling_7d",  # per-user event-time
    #   window (row_number top-1 vs RANGE-frame rolling sum)
    "event_type_transition_matrix": "user_rolling_7d",  # lag
    #   window + double rollup (Markov matrix)
    "signup_to_purchase_latency": "winsorized_order_values",  # ordinal
    #   rank arithmetic over a population-bounded window
    # events_variant_extract rotated INTO the driver window r9,
    # superseding events_json_bucket as the JSON-extraction witness:
    "events_json_bucket": "events_variant_extract",
    "user_event_type_map": "events_variant_extract",  # typed from_json
    #   + map HOF chain, canonical sorted rendering
    "events_schema_profile": "events_variant_extract",  # variant_explode
    #   generator + bounded-grid agg; same parse->extract->agg scan
    # event_sessionization rotated OUT in the r9 second wave (green
    # r1-r8); the per-user ordered-window family stays visible:
    "event_sessionization": "user_rolling_7d",  # per-user
    #   ordered window scan (lag/gap marking vs top-1 pick)
    "sliding_window_counts": "streaming_interval_join",
    "stream_static_enrich": "streaming_interval_join",
    # streaming_dedup rotated INTO the driver window r10 4th wave
    # (second real-readStream witness)
    # range_join_error_click rotated OUT in the r9 second wave (green
    # r1-r8); the events-pair time-band join stays visible via
    # asof_click_before_error:
    "range_join_error_click": "orders_pit_customer_join",  # same
    #   pair-match semantics (banded |ts diff| vs PIT as-of pick);
    #   the JVM banded equi-join plan is pinned in test_plans.py
    "streaming_interval_join_louter": "streaming_interval_join",
    "streaming_pit_enrich": "orders_pit_customer_join",
    "stateful_running_totals":
        "pytest:test_streaming applyInPandasWithState (no visible "
        "twin; exact-oracle + checkpoint-restart tests pin it)",
    # --- python surfaces -------------------------------------------------
    # arrow_doc_stats rotated INTO the driver window r10 4th wave,
    # superseding multimodal_frame_sample as the Arrow-batched Python
    # map witness:
    "multimodal_frame_sample": "arrow_doc_stats",  # Arrow-batched
    #   Python map surface (mapInPandas fan-out vs mapInArrow)
    "doc_chunk_spans_udtf": "arrow_doc_stats",  # python
    #   row fan-out surface (UDTF generator vs mapInPandas)
    "grouped_price_model": "arrow_doc_stats",  # batched Python surface
    #   (applyInPandas per-group vs mapInArrow per-batch)
    "pysource_synthdocs":
        "pytest:test_pysource Python DataSource batch reader (no "
        "visible twin; ordered per-band digest oracle runs locally)",
    "pysource_stream_synthdocs":
        "pytest:test_pysource streaming offsets (no visible twin; "
        "exactly-once restart test pins the offset contract)",

    # --- r9 rotation: fifteen 7-8x-green incumbents OUT (their green
    # history is CORRECTNESS_r1-r8) to admit fifteen never-checked
    # names; six remain bench headlines, so their perf is still
    # measured every round -----------------------------------------------
    "asof_click_before_error": "orders_pit_customer_join",  # ordered
    #   as-of pick family (still benched)
    "price_quantiles": "winsorized_order_values",  # two-phase ordinal rank
    "approx_distinct_stats": "hll_sketch_union",
    "tfidf_top_terms": "term_source_dispersion",  # term-keyed rollup
    #   + top-k-per-key window
    "doc_quality_score": "doc_subword_stats",  # narrow per-doc stats
    "dedup_exact": "simhash_fingerprints",
    "embedding_dedup_pairs": "hard_negative_mining_ann",  # blocked
    #   pair join + JVM cosine fold (still benched)
    "forecast_revenue": "pricing_summary",  # pushed-filter scan-agg
    #   (still benched)
    "multimodal_decode": "arrow_doc_stats",  # Arrow-batched
    #   mapInPandas/mapInArrow surface
    "lookup_replace_nation": "nation_trade_volume",  # broadcast-dim
    #   lookup join, unmatched-wiped semantics pytest-pinned
    "document_purge": "gopher_quality_flags",  # full-row predicate scan
    #   compiled to codegen'd projection + filter, no shuffle
    "simhash_near_pairs": "lsh_incremental_dedup",  # banded candidate
    #   equi-join near-dup pairs
    "ann_brute_force_topk": "hard_negative_mining_ann",
    "shipping_priority": "top_revenue_customers",  # filtered join +
    #   group agg + distributed take (still benched)
    "user_hourly_resample": "user_rolling_7d",  # event-keyed
    #   window family (grid gap-fill pytest-pinned in oracles)
    # --- r10 rotation: multi-green incumbents rotated out; each keeps
    #     a same-pattern visible twin ------------------------------------
    "customer_scd2_history": "orders_pit_customer_join",
    "customer_tags": "gopher_quality_flags",  # narrow per-row derive
    #   (array ops vs ratio flags), codegen'd projection
    "table_counts": "join_key_skew_profile",  # union of per-table counts; same bounded grouped-count profile plan
    "streaming_hourly_counts": "streaming_interval_join",
    "corpus_mixture_sample": "weighted_corpus_sample",
    "ivfpq_ann_probe": "ivfpq_residual_codes",  # same residual-PQ codes + ADC probe machinery
    "knn_ann_label_propagation": "hard_negative_mining_ann",
    "bm25_top_docs": "bm25_batch_served",  # same postings+stats BM25 plan, ad-hoc vs served
    "paragraph_dedup": "duplicate_spans",
    "rrf_fusion": "bm25_batch_served",  # BM25 leg + bounded rank fusion
    "linkgraph_cc_starcontraction": "linkgraph_bfs_reachability",  # iterative frontier-join fixpoint family
    "bloom_incremental_dedup": "lsh_incremental_dedup",
    # r10 wave 5: two veterans rotated OUT to admit linkgraph_khop_sssp
    # and doc_pareto_frontier (both first-time names)
    "minhash_lsh_dedup": "lsh_incremental_dedup",  # banded
    #   (band_idx, band_hash) candidate equi-join + exact verify
    "retrieval_pipeline_e2e": "bm25_batch_served",  # BM25 corpus
    #   pass + bounded top-k; its LSH leg twins via
    #   hard_negative_mining_ann (bucketed shortlist + rank window)
    "large_volume_customers": "top_revenue_customers",
    "trigram_backoff_score": "gopher_quality_flags",
    "heavy_hitters_topk": "cms_token_counts",
    "doc_boilerplate_coverage": "duplicate_spans",
    "split_leakage_audit": "duplicate_spans",
    "excess_share_suppliers": "sole_failing_supplier",  # TPC-H
    #   semi-join decorrelation shape (q20 / q21), plan-guarded in
    #   tests/test_plans.py::test_q2_q20_shapes_decorrelate
    # --- r10 serving-index mutation queries (new; each serves the
    #     probe pattern its visible twin already pins) ---------------

    # --- r11 rotation: seventeen multi-green incumbents OUT to admit
    #     seventeen first-time names (sixteen never-driver-checked +
    #     the new semantic_decontamination_ann); each keeps a
    #     same-pattern visible twin -----------------------------------
    "bm25_filtered_served": "bm25_batch_served",  # same bucket-pruned
    #   postings probe, term filter vs batched terms
    "bm25_top_docs_served": "bm25_batch_served",  # N=1 case of the
    #   batched bucket-pruned BM25 probe
    "bm25_snapshot_served": "bm25_tombstone_served",  # same
    #   delete→probe serving pattern, plus the snapshot/restore
    #   commit-point lifecycle around the vacuum
    "ann_snapshot_probe": "hard_negative_mining_ann",  # same
    #   cluster-shortlist probe shape over the materialized IVF
    #   layout, plus the snapshot/restore commit-point lifecycle
    "orders_price_drift_psi": "join_key_skew_profile",
    "linkgraph_label_propagation": "linkgraph_pagerank",
    "phrase_snapshot_served": "proximity_ranked_served",  # same
    #   bucket-pruned positional-probe pattern, plus the
    #   snapshot/restore commit-point lifecycle around the vacuum
    "cogroup_asof_pandas": "orders_pit_customer_join",  # as-of pick
    #   over keyed ordered feeds (cogrouped pandas vs PIT join); the
    #   batched-python surface stays visible via arrow_doc_stats
    "corpus_sorted_export": "sequence_packing",  # two-phase
    #   global-order computation (range-partitioned sort vs
    #   bucket-subtotal prefix sum), both plan-guarded in test_plans
    "customer_balance_deciles": "winsorized_order_values",  # grouped
    #   two-phase ordinal-rank family
    "doc_fetch_served": "docstore_as_of_fetch",  # bucket/manifest-
    #   scoped point fetch of the same doc store
    "doc_quality_linear_model": "gopher_quality_flags",  # one
    #   codegen'd per-doc scoring scan, no shuffle
    "event_funnel_conversion": "session_window_counts",  # sessionized
    #   event-time rollup family (lag/cumsum islands)
    "inverted_index_postings": "term_source_dispersion",  # term-keyed
    #   count rollup + ordered take
    "ivfadc_residual_multiprobe": "ivfpq_residual_codes",  # same
    #   residual-PQ code machinery; the shortlist probe shape stays
    #   visible via hard_negative_mining_ann
    "linkgraph_cc_certified": "linkgraph_bfs_reachability",  # iterative
    #   frontier equi-join to a certified fixpoint (same engine)
    "linkgraph_khop_sssp": "linkgraph_bfs_reachability",  # per-round
    #   frontier equi-join (+ MIN groupBy relax) fixpoint
    "phrase_match_served": "proximity_ranked_served",  # bucket-pruned
    #   two-term positional read, adjacency vs proximity band
    "quantized_rerank_topk": "late_interaction_served",  # shortlist +
    #   bounded rerank two-stage serving plan
    "token_pmi_pairs": "association_rules_pairs",  # pair-key count
    #   join + broadcast totals (PMI vs lift — same Apriori-k=2 plan)
    "user_cohort_retention": "user_rolling_7d",  # per-user event-time
    #   window + cohort-grid rollup
    "nation_market_share": "nation_trade_volume",  # broadcast-dim star
    #   join + share-of-total agg
    # --- r11 additions (registered local-only from birth) -----------
    "lineitem_zorder_asof": "lineitem_zorder_pruned",  # same layout
    #   build + manifest-pruned scan; the AS-OF/versioning machinery
    #   is additionally pinned by tests/test_zorder.py
    "semantic_decon_ann_recall": "semantic_decontamination_ann",  # runs
    #   the two visible screens and full-outer-compares their bounded
    #   flag sets — no new corpus-scale plan
}
