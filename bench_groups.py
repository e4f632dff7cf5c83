"""Bench query-group membership lists (dependency-free).

Shared by bench.py (the runner) and tools/bench_merge.py (the
artifact merger) so the merge tool never needs pyspark importable
just to sum timings. Group membership and order are FROZEN once a
round's artifact is published — the per-group subtotals are only
comparable across rounds if the sets never move.
"""

LEGACY_34 = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue",
    "tpch_q6_revenue_scan",
    "tpch_q8_market_share",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    "bloom_semi_join_lineitems",
    "heavy_hitter_users",
    "gapfill_hourly_counts",
    "chunk_documents",
    "asof_join_last_view",
    "sessionize_count",
    "session_funnel_conversion",
    "range_join_ship_window",
    "time_bucket_rollup",
    "w1_rolling_trend",
    "a3_daily_mean",
    "f6_dedup_keep_first",
    "union_dedup",
    "p4_p12_clean_text",
    "m6_m7_sentiment_scores",
    "dedup_exact_content",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_topk_cosine",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "split_train_val_test",
    "contamination_check",
    "pii_scrub_text",
    "pack_sequences_bins",
    "lda_topics",
]

# Round-5 widening: perf evidence for the operators added since the
# anchor set was frozen (time-series, skew join, scrape, streaming
# drain, multimodal, tf-idf, centroids, PatternAnalyzer sentiment).
NEW_R5 = [
    "ewma_daily_value",
    "retention_cohorts",
    "time_weighted_avg",
    "gapfill_interpolate",
    "salted_join_skewed",
    "s4_html_extract",
    "streaming_windowed_counts",
    "multimodal_image_meta",
    "tfidf_top_terms",
    "embedding_centroids",
    "sentiment_pattern_rules",
    # round-5 session 2: semantic dedup / data selection / PQ ANN /
    # video demux / span removal / perplexity filtering
    "semdedup_embeddings",
    "dsir_importance_weights",
    "similarity_pq_adc_topk",
    "multimodal_video_meta",
    "dedup_span_removal",
    "perplexity_buckets",
    "range_frame_trailing_sum",
    "inverted_index_blocks",
    "ohlc_resample_hourly",
    "rolling_distinct_users_7d",
    "similarity_ivfadc_topk",
    "ann_topk_batch",
    # round-5 session 3: graph analytics / ANN evaluation / prefix
    # scan / vocab coverage / CDC diff
    "pagerank_copurchase",
    "ann_recall_eval",
    "corpus_token_offsets",
    "vocab_oov_rate",
    "snapshot_delta_cdc",
    "fuzzy_name_pairs",
    "incremental_agg_maintenance",
    "link_prediction_suppliers",
    "unpivot_returnflag_metrics",
    "triangle_count_suppliers",
    "data_quality_audit",
    "bm25_topk_docs",
    "skyline_pareto_parts",
    "fuzzy_entity_clusters",
    "seasonal_decompose_daily",
    "ols_trend_per_type",
    "mad_outliers_per_type",
    "concurrent_sessions_sweep",
    "quality_logreg_score",
    "pr_curve_quality_filter",
    "grouping_sets_day_type",
    "quantile_normalize_scores",
    "corpus_report_by_source",
    "equidepth_bin_orders",
    "table_fingerprint_orders",
]

# Round-6 widening: every remaining driver-certified query gets a
# perf row (VERDICT r5 ask #7 — certified-but-unbenched tier), so
# BENCH_r06 covers the full driver-certified surface.
NEW_R6 = [
    "a1_count_rows",
    "a2_group_count",
    "cms_user_event_counts",
    "embedding_scalar_quant",
    "shortest_paths_suppliers",
    "textrank_keywords",
    "zorder_event_cells",
    "a4_vocab_prune",
    "a6_top_orders",
    "dedup_cc_clusters",
    "dedup_embedding_cosine",
    "dedup_minhash_clusters",
    "dedup_simhash",
    "distinct_users_per_type",
    "event_interarrival_stats",
    "event_transition_matrix",
    "f1_contains_filter",
    "f2_ts_range_filter",
    "f3_dropna",
    "f4_min_word_count",
    "f5_required_field",
    "f7_anti_join_unseen",
    "j1_broadcast_enrich",
    "j_multiway_region_count",
    "multimodal_audio_meta",
    "p13_lemmatize",
    "p15_p16_day_cast",
    "p1_strip_last_segment",
    "pivot_daily_event_counts",
    "prepare_corpus_pipeline",
    "rollup_order_status",
    "s2_sitemap_parse",
    "sentiment_by_source",
    "sentiment_full_lexicon",
    "session_paths_top",
    "similarity_lsh_topk",
    "streaming_dedup",
    "streaming_interval_join_outer",
    "streaming_session_windows",
    "token_count_bpe",
    "tpch_q10_returned_items",
    "tpch_q12_late_shipments",
    "tpch_q16_supplier_cnt",
    "tpch_q19_disjunctive_pred",
    "tpch_q1_decimal_scale",
    "tpch_q20_excess_suppliers",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "w3_argmax_vector",
    "zscore_per_type",
]

# Round-7 widening: the queries rotated into the driver window this
# round that had no perf row yet (every driver-certified query keeps
# a BENCH_FULL.json entry).
NEW_R7 = [
    "streaming_interval_join",
    "cube_status_priority",
    "orders_with_bulk_items",
    "price_quantiles",
    "approx_price_quantiles",
    "value_histogram",
    "histogram_totalprice",
    "deterministic_shuffle_order",
    "json_props_stats",
    "json_single_parse_stats",
    "rank_orders_in_priority",
    "new_users_per_day",
    "sketch_distinct_users_daily",
    "m3_coherence_umass",
    "m3_coherence_cv",
    "bpe_learned_merges",
    "similarity_ivf_topk",
    "similarity_ivf_fixed_topk",
    # real codec decode (round 7): PNG inflate+unfilter, GIF LZW,
    # WAV PCM
    "multimodal_image_decode",
    "multimodal_image_resize",
    "multimodal_gif_decode",
    "multimodal_jpeg_decode",
    "multimodal_jpeg_color_decode",
    "multimodal_audio_decode",
    "multimodal_g711_decode",
    "multimodal_video_frame_decode",
    "streaming_image_decode",
]

# Round-7 completion: the remaining registered queries that had no
# perf row (driver-certified TPC-H singles, sampling/selection ops,
# profiling reports, streaming state drain). With these the bench
# set IS the registry — every queries() entry has a BENCH_FULL.json
# timing, so a regression anywhere in the surface is visible
# round-over-round.
NEW_R7_REST = [
    "tpch_q4_priority_check",
    "tpch_q11_important_parts",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "approx_distinct_users",
    "curriculum_order_bands",
    "doc_term_stats",
    "dup_ngram_span_score",
    "hard_negatives_topk",
    "mix_sources_weighted",
    "multimodal_video_frames",
    "profile_documents",
    "repetition_quality",
    "select_token_budget",
    "setop_intersect_except",
    "stratified_sample_sources",
    "streaming_user_stats",
    "top3_orders_per_segment",
    "top_bigrams",
    "weighted_sample_by_length",
    # late-r7: BPE apply (replace-chain encode over word types)
    "bpe_encode_subwords",
]

NEW_R8 = [
    "community_detection_suppliers",
    "nb_lang_confusion",
    "item_item_recs_topk",
    "query_likelihood_topk",
    "rake_keyphrases",
    "kmv_distinct_setops",
    "nb_lang_confusion_hashed",
    "streaming_kmv_distinct",
    "kfold_assignment",
]

# Round-9 widening: queries added this round.
NEW_R9 = [
    "nb_kfold_eval",
    "community_modularity",
    "streaming_kmv_setops",
    "graph_random_walks",
    "walk_skipgram_pmi",
    "node2vec_biased_walks",
    "ppr_related_entities",
    "multimodal_jpeg_sa_decode",
    "ivm_join_view_refresh",
    "streaming_join_view",
    "item_item_recs_pruned",
    "skipgram_negative_samples",
    "gopher_quality_flags",
]

# Round-10 widening: queries added this round.
NEW_R10 = [
    "c4_quality_flags",
    "pmi_embedding_vectors",
    "unigram_lm_vocab",
    "gopher_repetition_flags",
    "streaming_quality_gate",
    "embedding_edge_recall",
    "quality_filter_agreement",
    # round-10 continuation session
    "kmeans_lloyd_embeddings",
    "consistent_hash_shards",
    "temperature_mix_weights",
    "poisson_bootstrap_ci",
    "minhash_recall_eval",
    "wordpiece_encode",
    "calibration_ece",
    "kl_divergence_sources",
    "kcore_suppliers",
    "bigram_llr_collocations",
    "degree_assortativity",
    "lsa_doc_embeddings",
    "ndcg_bm25_eval",
    "streaming_hrw_route",
    "url_canonicalize_dedup",
    "scd2_type_history",
    "hits_copurchase",
]

# Round-11 widening: queries added this round.
NEW_R11 = [
    "suffix_array_spans",
    "aho_corasick_matches",
    "exact_substr_contamination",
    "kneser_ney_bigram_lm",
    "butterfly_counts_bipartite",
    "streaming_blocklist_gate",
    "kn_perplexity_buckets",
    "shingle_containment_pairs",
    "hilbert_event_cells",
]

# Round-12 widening: queries added this round.
NEW_R12 = [
    "item_item_recs_dimsum",
    "suffix_span_removal",
    "c4_badwords_ac",
    "butterfly_counts_sampled",
]
