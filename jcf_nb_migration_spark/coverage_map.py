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
    "ann_lsh_bucketed": "hard_negative_mining",
    "ann_lsh_multiprobe": "hard_negative_mining",
    "ivf_ann_multiprobe": "hard_negative_mining",  # same IVF cluster-shortlist
    #   probe machinery
    "ivf_ann_probe": "hard_negative_mining",  # cluster-shortlist probe + rank
    #   window
    # ivfadc_residual_multiprobe rotated INTO the driver window r9
    # (second wave), superseding ivfadc_residual_probe:
    "ivfadc_residual_probe": "pq_codes",  # same residual-PQ
    #   code machinery (probe shortlist shape: hard_negative_mining_ann)
    # quantized_rerank_topk rotated INTO the driver window r9
    "embedding_norm_stats": "hard_negative_mining",
    "embedding_normalize": "hard_negative_mining",
    # record_linkage_merge rotated OUT r14 (8th wave, green r9-r13);
    # the blocked-candidate-equi-join + exact-verify pattern stays
    # visible via the LSH band-blocking twin:
    "fuzzy_name_matches": "lsh_incremental_dedup",  # deletion-key
    #   blocking equi-join + edit-distance verify == band-blocking
    #   candidate equi-join + exact-similarity verify
    "part_name_fuzzy_pairs": "lsh_incremental_dedup",  # blocked fuzzy
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
    # paragraph_dedup rotated INTO the driver window r7
    "minhash_signatures": "lsh_incremental_dedup",
    # lsh_incremental_dedup rotated INTO the driver window r9
    # bloom_incremental_dedup rotated INTO the driver window r7
    "doc_fingerprint": "doc_winnow_fingerprints",  # per-doc fingerprint projection over the same tokenized scan
    # --- text / curation -------------------------------------------------
    # bpe_merge_table / doc_bpe_stats rotated OUT in the r9 second
    # wave (green r3-r8); the BPE trainer loop is pinned by
    # tests/test_text_bpe.py and the text-family scans stay visible:
    "bpe_merge_table": "event_type_transition_matrix",  # vocabulary/pair-keyed
    #   aggregate + join chain (the trainer's per-round pair counts)
    "doc_bpe_stats": "doc_subword_stats",
    "corpus_vocabulary": "doc_subword_stats",
    # doc_subword_stats rotated INTO the driver window r10 4th wave,
    # superseding doc_token_stats as the token-explode witness:
    "doc_token_stats": "doc_subword_stats",
    # token_pmi_pairs rotated INTO the driver window r9
    # gopher_quality_flags rotated INTO the driver window r9
    # logreg_gd_training rotated OUT in the r9 second wave (green
    # r5-r8); the iterative fixed-point-aggregate loop stays visible
    # via linkgraph_pagerank:
    "logreg_gd_training": "linkgraph_bfs_reachability",  # per-round
    #   map-side-combinable aggregate + bounded driver state — the
    #   iterative driver-loop fixpoint family (its serve/calibration
    #   twin rotated OUT r14)
    "doc_lang_id": "doc_subword_stats",
    "code_switch_profile": "doc_subword_stats",  # chunk explode +
    #   per-doc lang-mix rollup (paragraph_dedup's shuffle graph)
    "doc_repetition_stats": "doc_bigram_lm_score",  # in-row per-doc
    #   gram stats over the same tokenized scan (gram family)
    # curation_pipeline_e2e rotated OUT in the r9 second wave (green
    # r6-r8); every stage stays individually visible:
    "curation_pipeline_e2e": "gopher_quality_flags",
    # semdedup_prune rotated OUT in the r9 second wave (green r4-r8):
    "semdedup_prune": "lsh_incremental_dedup",  # standing-index
    #   candidate shortlist + per-doc keep/drop verdict

    # --- retrieval -------------------------------------------------------
    # bm25_top_docs rotated INTO the driver window r7
    # rrf_fusion rotated INTO the driver window r7
    # positional retrieval (r9): term-filtered postings + bounded
    # positional self-join — the term-keyed probe family
    # phrase_match_served / bm25_filtered_served / doc_fetch_served
    # rotated INTO the driver window r9 (second wave)
    "phrase_match_docs": "bm25_batch_served",  # term-keyed postings
    #   probe of the same lexical index (positional witnesses rotated
    #   OUT r14; the positional self-join leg rides the same read path)
    # --- corpus assembly / sampling --------------------------------------
    "stratified_sample": "source_sampling_weights",  # deterministic
    #   hash-threshold sampling; the weights query drives the same
    #   per-doc selection pass
    "doc_chunk_overlap": "doc_chunk_spans_udtf",
    # --- profiling / sketches -------------------------------------------
    "customer_column_profile": "daily_volume_anomalies",
    "referential_integrity_audit": "daily_volume_anomalies",
    "benford_first_digit": "daily_volume_anomalies",
    "price_histogram": "winsorized_order_values",  # value-bucket/rank
    #   assignment + bounded-grid count rollup
    "quantity_price_correlation": "pricing_summary",  # scan-agg moments
    #   (sum/sumsq/cross) in one pass
    "daily_new_users": "session_conversion_funnel",
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
    "salted_user_totals": "pricing_summary",  # explicit-salt two-phase
    #   agg == the same partial/final hash-agg pair; AQE skew twin
    #   pinned in tests/test_plans.py::test_aqe_splits_skewed_join
    "pii_scrub_stats": "gopher_quality_flags",  # regex-replace narrow
    #   projection; plan pinned by test_plans::test_pii_scrub_is_narrow
    "mktsegment_distinct": "pricing_summary",  # single-key distinct agg
    #   == the same two-level hash-aggregate plan
    "customers_with_urgent_orders": "top_revenue_customers",
    "customers_without_orders": "top_revenue_customers",  # left-anti
    #   non-existence join on the same customer/order keys (set-ops
    #   witness rotated OUT r14; EXCEPT lowers to this left-anti shape)
    "high_balance_never_fulfilled": "top_revenue_customers",  # EXCEPT ==
    #   left-anti hash join on the same customer keys
    "discounted_brand_revenue": "top_revenue_customers",
    # nation_trade_volume rotated INTO the driver window r10 4th wave,
    # superseding local_supplier_volume as the broadcast-dim star-join
    # + group-agg witness (Q5/Q7 family):
    "local_supplier_volume": "top_revenue_customers",
    "regional_customer_distribution": "top_revenue_customers",
    "top_supplier_revenue": "important_supplier_share",
    "promo_revenue_share": "top_revenue_customers",
    "part_supplier_variety": "important_supplier_share",
    "nullsafe_cohort_compare": "top_revenue_customers",
    "small_quantity_revenue": "top_revenue_customers",  # filtered
    #   join + scalar agg (Q17 family)
    # top_revenue_customers rotated INTO the driver window r10 4th
    # wave, superseding returned_item_report as the join + agg +
    # global-top-k witness (Q10 family):
    "returned_item_report": "top_revenue_customers",
    "priority_shipmode_report": "top_revenue_customers",  # filtered
    #   orders⋈lineitem join + small group agg (was covered by
    #   late_shipment_priority_count before its r6 rotation out)
    "late_shipment_priority_count": "top_revenue_customers",
    "supplier_nation_directory": "top_revenue_customers",
    "order_status_pivot": "nation_metrics_unpivot",  # pivot = the same
    #   grouping-sets/EXPAND plan family as cube
    "part_brand_type_rollup": "nation_metrics_unpivot",  # ROLLUP
    #   grouping-sets (EXPAND) family
    # nation_metrics_unpivot rotated INTO the driver window r10 4th
    # wave, superseding lineitem_cube as the grouping-sets/reshape
    # (EXPAND) witness:
    "lineitem_cube": "nation_metrics_unpivot",  # grouping-sets/reshape
    #   (EXPAND) family: cube vs unpivot of the same wide agg
    "order_value_ranks": "session_conversion_funnel",  # keyed ranked
    #   window — the same per-key Window exchange+sort shape as the
    #   funnel's per-user windows (lateral witness rotated OUT r14)
    "user_running_value": "session_conversion_funnel",  # per-user running
    #   cumulative window — the funnel's session counter is the same
    #   unbounded-preceding sum window
    "incremental_agg_merge": "pricing_summary",  # partial-agg
    #   union + merge groupBy of the same scan-agg
    "retractable_agg_merge": "pricing_summary",  # signed-partial
    #   union + merge groupBy (incremental_agg_merge with retraction)
    # corpus_novelty_curve rotated INTO the driver window r10 4th
    # wave, superseding decontaminate_ngrams as the shingle-explode +
    # agg/join witness (decontaminate stays bench-measured):
    "decontaminate_ngrams": "doc_bigram_lm_score",  # n-gram explode
    #   + gram-keyed equi-join (still benched every round)
    "event_sequence_pattern": "session_conversion_funnel",
    # --- CDC / temporal --------------------------------------------------
    "orders_upsert": "orders_snapshot_diff",  # keyed CDC merge-latest
    #   over the same orders feed the snapshot diff consumes
    # r10: docstore time travel — build/COW/bucketed-fetch machinery is
    # the visible docstore_upsert_fetch; the manifest AS-OF read path
    # and the version-diff full-outer compare are additionally pinned
    # by tests/test_timetravel.py
    "volume_shipping_report": "top_revenue_customers",
    # large_volume_customers rotated INTO the driver window r9
    # (second wave). Q18 notes kept for history:
    # Q18:
    #   agg-subquery semi-join + re-aggregate
    "regional_min_balance_supplier": "important_supplier_share",  # 
    #   correlated scalar subquery decorrelated to per-group agg join-back (Q2
    #   vs Q11)
    # --- events / time series -------------------------------------------
    "events_hourly": "streaming_interval_join_louter",  # batch event-time agg; the streamed event-time shape stays visible here
    # user_rolling_7d rotated INTO the driver window r10 4th wave,
    # superseding latest_event_per_user as the per-user event-time
    # window witness:
    "latest_event_per_user": "session_conversion_funnel",  # per-user
    #   row_number-window take over the same events scan (lateral
    #   witness rotated OUT r14); still benched every round
    "signup_to_purchase_latency": "winsorized_order_values",  # ordinal
    #   rank arithmetic over a population-bounded window
    # events_variant_extract rotated INTO the driver window r9,
    # superseding events_json_bucket as the JSON-extraction witness:
    "events_json_bucket": "user_event_type_map",  # from_json payload
    #   extraction + agg over the same events column
    # event_sessionization rotated OUT in the r9 second wave (green
    # r1-r8); the per-user ordered-window family stays visible:
    "event_sessionization": "session_conversion_funnel",
    "sliding_window_counts": "streaming_interval_join_louter",
    # streaming_dedup rotated INTO the driver window r10 4th wave
    # (second real-readStream witness)
    # range_join_error_click rotated OUT in the r9 second wave (green
    # r1-r8); the events-pair time-band join stays visible via
    # asof_click_before_error:
    "range_join_error_click": "promo_session_attribution",  # same
    #   time-band pair-match semantics (banded |ts diff| vs session
    #   interval overlap); the JVM banded equi-join plan is pinned in
    #   test_plans.py
    # --- python surfaces -------------------------------------------------
    # arrow_doc_stats rotated INTO the driver window r10 4th wave,
    # superseding multimodal_frame_sample as the Arrow-batched Python
    # map witness:
    "multimodal_frame_sample": "scalar_iter_doc_stats",  # batched-
    #   Python fan-out surface (pandas-udf family; the multimodal
    #   dedup witness rotated OUT r14)
    "grouped_price_model": "grouped_price_model_jvm",  # its own scale
    #   twin (SCALE_TWINS): the literal same oracle, pure-JVM plan
    # --- r14 rotation (8th wave): eighteen multi-green incumbents OUT
    #     (history in CORRECTNESS_r1-r13) to admit eighteen
    #     never-driver-checked names; each rotated-out name keeps a
    #     same-pattern visible twin -----------------------------------
    "corpus_novelty_curve": "doc_bigram_lm_score",  # gram/shingle
    #   explode -> gram-keyed count agg + join-back per doc (novelty
    #   first-occurrence vs bigram LM scoring over the same grams)
    "bm25_snapshot_served": "bm25_batch_served",  # same bucket-pruned
    #   BM25 probe of the same serving index; commit-point lifecycle
    #   also exercised by docstore_as_of_fetch's versioned read
    "customer_order_distribution": "important_supplier_share",  # TPC-H
    #   shape family: outer-join agg-of-agg vs scalar-subquery HAVING
    "dq_expectations": "gopher_quality_flags",  # fused per-rule
    #   conditional-agg quality report over one scan
    "lineitem_zorder_asof": "docstore_as_of_fetch",  # versioned-layout
    #   as-of read via manifest (z-order data files vs docstore COW)
    "logreg_calibration": "bm25_batch_served",  # broadcast-model scoring
    #   projection + bounded group agg (serving-scorer family)
    "doc_pareto_frontier": "scalar_iter_doc_stats",  # grouped pandas-UDF
    #   surface over the same per-doc stats scan
    "dsir_importance": "source_sampling_weights",  # importance-weighted
    #   deterministic hash-threshold selection; the weights query
    #   computes the same per-source weighting pass
    "media_perceptual_dedup": "source_dedup_matrix",  # fingerprint-keyed
    #   cross-group dedup rollup (perceptual hash vs content hash)
    "phrase_snapshot_served": "bm25_batch_served",  # bucket-pruned
    #   postings probe of the same serving index (positional self-join
    #   leg rides the same io/lexical read path)
    "cohort_ltv_curve": "session_conversion_funnel",  # per-user
    #   epoch-bucket windows + rollup over the same events scan
    "k_anonymity_audit": "gopher_quality_flags",  # groupBy-threshold
    #   audit screen: hash-agg + threshold filter over one scan
    "lateral_top_customers": "important_supplier_share",  # correlated
    #   subquery decorrelated to per-group agg + join-back (lateral
    #   rank-take vs scalar-subquery HAVING)
    "events_schema_profile": "user_event_type_map",  # same JSON-payload
    #   extraction scan (schema census vs map-typed from_json)
    "customer_set_ops": "top_revenue_customers",  # INTERSECT/EXCEPT
    #   lower to left-semi/left-anti hash joins on the same keys
    "record_linkage_merge": "lsh_incremental_dedup",  # blocked candidate
    #   equi-join + exact verify (deletion-key blocking + edit distance
    #   vs LSH band-blocking + exact similarity) + survivor rollup
    "cms_token_counts": "pricing_summary",  # bounded mergeable-sketch
    #   counter table == one partial/final hash-agg pass
    "orders_pit_customer_join": "promo_session_attribution",  # temporal
    #   pair-join family: PIT as-of pick vs interval-overlap + as-of
    #   attribution pick over the same keyed feeds
    "pysource_synthdocs":
        "pytest:test_pysource Python DataSource batch reader (no "
        "visible twin; ordered per-band digest oracle runs locally)",

    # --- r9 rotation: fifteen 7-8x-green incumbents OUT (their green
    # history is CORRECTNESS_r1-r8) to admit fifteen never-checked
    # names; six remain bench headlines, so their perf is still
    # measured every round -----------------------------------------------
    "asof_click_before_error": "promo_session_attribution",  # ordered
    #   as-of/interval pick family (still benched; the PIT witness
    #   rotated OUT r14)
    "price_quantiles": "winsorized_order_values",  # two-phase ordinal rank
    "approx_distinct_stats": "pricing_summary",  # one-pass mergeable
    #   sketch aggregation == the same partial/final hash-agg plan
    "tfidf_top_terms": "source_quota_cap",  # term-keyed rollup
    #   + top-k-per-key window
    "doc_quality_score": "doc_subword_stats",  # narrow per-doc stats
    "dedup_exact": "doc_winnow_fingerprints",  # content-hash
    #   projection + one fingerprint-keyed shuffle (doc md5 groupBy
    #   vs winnow hash distinct), still benched every round
    "embedding_dedup_pairs": "hard_negative_mining",  # blocked pair join + JVM
    #   cosine fold (still benched)
    "forecast_revenue": "pricing_summary",  # pushed-filter scan-agg
    #   (still benched)
    "multimodal_decode": "scalar_iter_doc_stats",  # batched-Python
    #   binary-decode surface (pandas-udf family)
    "lookup_replace_nation": "top_revenue_customers",  # broadcast-dim lookup
    #   equi-join; unmatched-wiped semantics pytest-pinned
    "document_purge": "gopher_quality_flags",  # full-row predicate scan
    #   compiled to codegen'd projection + filter, no shuffle
    "simhash_near_pairs": "lsh_incremental_dedup",  # banded candidate
    #   equi-join near-dup pairs
    "ann_brute_force_topk": "hard_negative_mining",
    "shipping_priority": "top_revenue_customers",  # filtered join +
    #   group agg + distributed take (still benched)
    "user_hourly_resample": "session_conversion_funnel",
    # --- r10 rotation: multi-green incumbents rotated out; each keeps
    #     a same-pattern visible twin ------------------------------------
    "customer_scd2_history": "orders_snapshot_diff",  # keyed CDC
    #   latest-version pick over the same keyed feed
    "customer_tags": "gopher_quality_flags",  # narrow per-row derive
    #   (array ops vs ratio flags), codegen'd projection
    "table_counts": "gopher_quality_flags",  # union of per-table counts;
    #   the same fused conditional-agg report plan (dq witness rotated
    #   OUT r14)
    "streaming_hourly_counts": "streaming_interval_join_louter",
    "corpus_mixture_sample": "source_sampling_weights",  # temperature/
    #   mixture weights -> deterministic weighted selection, same
    #   one-pass plan
    "ivfpq_ann_probe": "pq_codes",  # same residual-PQ codes + ADC probe machinery
    "knn_ann_label_propagation": "hard_negative_mining",
    "bm25_top_docs": "bm25_batch_served",  # same postings+stats BM25 plan, ad-hoc vs served
    "paragraph_dedup": "doc_winnow_fingerprints",  # explode text
    #   units -> hash -> per-unit keyed aggregate (paragraph-hash
    #   groupBy vs winnowed k-gram fingerprint selection)
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
    "heavy_hitters_topk": "pricing_summary",  # bounded sketch-count
    #   hash-agg + ordered take (sketch witness rotated OUT r14)
    "doc_boilerplate_coverage": "doc_winnow_fingerprints",  # span
    #   explode -> hash -> cross-doc frequency shuffle (boilerplate
    #   span counts vs winnow fingerprint spans over the same scan)
    "split_leakage_audit": "doc_winnow_fingerprints",  # k-gram
    #   fingerprint explode + fingerprint-keyed equi-join (leakage
    #   overlap vs winnow selection of the same shingle hashes)
    "excess_share_suppliers": "important_supplier_share",  # 
    #   aggregated-threshold semi-join decorrelation (Q20's agg-gated IN vs
    #   Q11's HAVING share gate); plan-guarded in
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
    "cogroup_asof_pandas": "scalar_iter_doc_stats",  # batched-pandas
    #   Python surface (cogroup vs scalar-iter); the as-of pick
    #   semantics stay visible via promo_session_attribution
    "corpus_sorted_export": "packing_efficiency_report",  # two-phase
    #   global-order computation (range-partitioned sort vs
    #   bucket-subtotal prefix sum), both plan-guarded in test_plans
    "customer_balance_deciles": "winsorized_order_values",  # grouped
    #   two-phase ordinal-rank family
    "doc_fetch_served": "docstore_as_of_fetch",  # bucket/manifest-
    #   scoped point fetch of the same doc store
    "doc_quality_linear_model": "gopher_quality_flags",  # one
    #   codegen'd per-doc scoring scan, no shuffle
    "event_funnel_conversion": "session_conversion_funnel",  # sessionized
    #   event-time rollup family (lag/cumsum islands)
    "inverted_index_postings": "source_quota_cap",  # term-keyed
    #   count rollup + ordered take
    "ivfadc_residual_multiprobe": "pq_codes",  # same
    #   residual-PQ code machinery; the shortlist probe shape stays
    #   visible via hard_negative_mining_ann
    "linkgraph_cc_certified": "linkgraph_bfs_reachability",  # iterative
    #   frontier equi-join to a certified fixpoint (same engine)
    "linkgraph_khop_sssp": "linkgraph_bfs_reachability",  # per-round
    #   frontier equi-join (+ MIN groupBy relax) fixpoint
    "phrase_match_served": "bm25_batch_served",  # bucket-pruned two-term
    #   postings read of the same serving index
    "quantized_rerank_topk": "late_interaction_rerank",  # shortlist +
    #   bounded rerank two-stage serving plan
    "token_pmi_pairs": "event_type_transition_matrix",  # pair-key count
    #   join + broadcast totals (PMI vs lift — same Apriori-k=2 plan)
    "user_cohort_retention": "session_conversion_funnel",  # per-user
    #   epoch bucketing + double aggregation over the same events scan
    "nation_market_share": "important_supplier_share",
    # --- r11 additions (registered local-only from birth) -----------
    # --- r12 rotation (6th wave): eighteen multi-green incumbents OUT
    #     (2-7 driver greens each, history in CORRECTNESS_r1-r11) to
    #     admit eighteen never-driver-checked names; each keeps a
    #     same-pattern visible twin -----------------------------------
    "hard_negative_mining_ann": "hard_negative_mining",  # same IVF
    #   cluster-shortlist probe + per-probe rank window, now with the
    #   commit-point lifecycle around it (7 driver greens r1-r11)
    "bm25_tombstone_served": "bm25_batch_served",  # same bucket-pruned
    #   BM25 probe of the same serving index (the snapshot/tombstone
    #   lifecycle witness rotated OUT r14)
    "proximity_ranked_docs": "bm25_batch_served",  # term-keyed postings
    #   probe family (positional witnesses rotated OUT r14)
    "join_key_skew_profile": "daily_volume_anomalies",  # grouped-count
    #   distribution rollup over one scan, same profile-agg plan
    "linkgraph_pagerank": "knn_label_propagation",  # per-round
    #   node-keyed equi-join + groupBy fixpoint loop (same engine)
    "weighted_median_gagg": "weighted_median_jvm",  # its own scale
    #   twin (SCALE_TWINS): the literal same oracle, pure-JVM plan
    "linkgraph_triangles": "linkgraph_bfs_reachability",
    "docstore_upsert_fetch": "docstore_as_of_fetch",
    "cobucketed_order_revenue": "bm25_batch_served",  # co-bucketed
    #   zero-exchange join; the bucket-pruned read side stays visible
    "streaming_dedup": "streaming_interval_join_louter",
    "weighted_corpus_sample": "source_sampling_weights",  # A-ES weighted
    #   sampling == weight-driven selection: both one-pass deterministic
    #   weight-threshold scans over per-doc/per-source scores
    "user_rolling_7d": "session_conversion_funnel",
    "nation_trade_volume": "important_supplier_share",
    "idle_rich_customers": "important_supplier_share",
    "events_variant_extract": "user_event_type_map",  # same semi-
    #   structured payload extraction scan (variant path vs map-typed
    #   from_json)
    "hll_sketch_union": "pricing_summary",  # mergeable-sketch union ==
    #   the same partial/final agg-merge plan (sketch witness rotated
    #   OUT r14)
    "sole_failing_supplier": "top_revenue_customers",  # Q21's semi+anti
    #   composite lowers to left-semi/left-anti hash joins on the same
    #   supplier/order keys (set-ops witness rotated OUT r14)
    "arrow_doc_stats": "doc_chunk_spans_udtf",  # Arrow-batched Python
    #   surface: mapInArrow per-batch vs UDTF generator, same batch
    #   shape and schema contract
    # --- r13 rotation (7th wave): eighteen multi-green incumbents OUT
    #     (history in CORRECTNESS_r1-r12) to admit eighteen
    #     never-driver-checked names, five of them streaming (the one
    #     family with a single driver-checked member before r13); each
    #     rotated-out name keeps a same-pattern visible twin ----------
    "simhash_fingerprints": "doc_winnow_fingerprints",  # per-doc
    #   fingerprint projection over the same tokenized scan (simhash
    #   bit-vote vs winnow window-min, both explode->hash->per-doc agg)
    "ivfpq_residual_codes": "pq_codes",  # same PQ encode projection;
    #   the residual variant adds one broadcast centroid subtract
    "corpus_split_assign": "corpus_global_shuffle",  # deterministic
    #   hash-keyed assignment scan (split label vs shuffle key), same
    #   one-pass keyed projection + ordered output
    "streaming_interval_join": "streaming_interval_join_louter",  # the
    #   louter run IS the inner join plus watermark-gated NULL emission
    #   (same two watermarked readStream branches, same state layout)
    "late_interaction_served": "late_interaction_rerank",  # same MaxSim
    #   shortlist + bounded rerank, served snapshot vs ad-hoc scan
    "sequence_packing": "packing_efficiency_report",  # the report runs
    #   the same greedy bin-packing machinery and rolls up its output
    "docstore_change_feed": "docstore_as_of_fetch",  # same docstore
    #   manifest/version read path; the feed diffs two versions the
    #   as-of fetch pins individually
    "lineitem_zorder_pruned": "docstore_as_of_fetch",  # manifest-scoped
    #   pruned read of a versioned layout (z-order min/max vs docstore
    #   manifest; the z-order witness rotated OUT r14)
    "semantic_decontamination": "semantic_decon_ann_recall",  # the
    #   recall report runs the exact leg AND the ANN leg of the same
    #   decontamination join
    "semantic_decontamination_ann": "semantic_decon_ann_recall",
    "session_window_counts": "session_conversion_funnel",  # sessionized
    #   event-time rollup family (lag/cumsum islands); the readStream
    #   session-window surface stays pinned by tests/test_streaming_ingest
    "linkgraph_label_propagation": "knn_label_propagation",  # per-round
    #   node-keyed equi-join + mode/groupBy fixpoint loop (same engine,
    #   kNN-derived edges instead of linkgraph edges)
    "association_rules_pairs": "event_type_transition_matrix",  # pair-
    #   keyed count aggregate + broadcast marginal totals (lift vs
    #   row-normalized transition probabilities)
    "proximity_ranked_served": "bm25_batch_served",  # bucket-pruned
    #   postings probe of the same serving index
    "term_source_dispersion": "source_quota_cap",  # term/source-keyed
    #   rollup + top-k-per-key window (source_quota_cap's own pattern)
    "duplicate_spans": "doc_winnow_fingerprints",  # span/k-gram explode
    #   -> hash -> per-unit aggregate shuffle (dup detection vs
    #   winnowed fingerprint selection)
    "ann_snapshot_probe": "hard_negative_mining",  # same IVF cluster-
    #   shortlist probe + per-probe rank window; the snapshot commit-
    #   point lifecycle stays pinned by tests/test_ivf_snapshot
    "orders_price_drift_psi": "daily_volume_anomalies",  # grouped
    #   distribution rollup + broadcast-baseline compare over one scan
    #   (PSI bins vs per-day anomaly z-scores)
    # --- r13 additions (registered local-only from birth) -----------
}

# Scale twins (VERDICT r12 item 7): API-surface queries whose measured
# cost model is the point (e.g. a grouped-agg pandas UDF) paired with
# the pure-JVM formulation that IS the 100-TB path. The contract is
# machine-checked by tests/test_coverage_map.py: both names registered,
# and both carry the LITERAL SAME oracle SQL — same inputs, same
# output, different execution surface — so the claim "a scale path
# exists and computes the same thing" is CI, not prose.
SCALE_TWINS: dict[str, str] = {
    # Arrow-shipped per-group Python sort  vs  groupBy(key, value)
    # partial-agg collapse + one window over distinct values:
    "weighted_median_gagg": "weighted_median_jvm",
    # Arrow-shipped whole-group OLS fit (parallelism = group count)
    # vs one map-side-combinable decimal moment aggregation:
    "grouped_price_model": "grouped_price_model_jvm",
}
