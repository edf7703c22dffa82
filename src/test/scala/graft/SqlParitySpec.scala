package graft

/** SQL-frontend parity: the ANSI oracle statements for the relational
  * query set run unchanged through `spark.sql` and must produce exactly
  * the DataFrame formulation's rows. A user can address this engine in
  * plain SQL (views registered by `Tables.registerAll`) or through the
  * typed API and get identical results — the two entries share Catalyst,
  * so this pins the whole parse→analyze→optimize path, not a re-test of
  * the operators. (Oracles using DuckDB-only constructs are exercised
  * against DuckDB by the driver instead.)
  */
class SqlParitySpec extends SparkSuite {

  /** Every oracle whose SQL text runs UNCHANGED on spark.sql (with the
    * [[graft.functions.SqlCompat]] DuckDB-dialect alias pack
    * registered) with row-identical results — probed exhaustively by
    * SqlParityProbe, 205 of 321 as of round 10 (the preference/eval
    * wave landed 8 of its 13 oracles directly on the list, the
    * batch-construction wave 5 of 8, and the post-training/serving
    * wave all 4, plus q_vocab_growth — the whole first-touch +
    * quantized-Heaps pipeline parses verbatim — while
    * dd_threshold_curve rides the simhash fingerprint chain's '0x'
    * hex cast; the exclusions are the usual
    * dialect reasons: q_ab_srm, q_group_sample, q_split_leakage and
    * q_stratified_kfold cast a '0x…' hex string to BIGINT —
    * PortableHash's DuckDB rendering, a cast form SqlCompat's name
    * aliases cannot bridge — q_survivorship rides the components
    * family's recursive-CTE UNION, and q_chi2_independence /
    * q_domain_reweight / q_bradley_terry need `array_agg(x ORDER BY
    * y)` for their order-pinned double folds, an aggregate-ORDER-BY
    * form Spark's parser rejects). The round-9 dialect
    * bridge (`divide()`, polymorphic `epoch_ms`, literal `strftime`,
    * `list_contains`/`list_max`) plus the round-10 rewrites (the shared
    * dot-product SQL off `list_zip`'s positional `s[1]` subscript and
    * onto `generate_series`/`list_extract` — both names bridged, both
    * 1-based; bare decimal literals in q_gd_train/q_triangle_count
    * spelled `CAST(… AS DOUBLE)` per the ANSI DECIMAL-parse gotcha)
    * moved the whole ann/embedding family onto the list, and the
    * tokenizer-chain sweep (toks[i] n-gram oracles onto list_extract;
    * list_value for list literals; ROW → struct; DuckDB's 2-arg
    * regexp_extract_all group-0 default and 'g'-flag regexp_replace
    * aliased) added the ta_* text family. The remaining 107 stay off
    * for dialect reasons the pack deliberately does not paper over:
    * raw 1-based `l[i]` subscripts where the bracket FORM is the
    * query's point (q_array_funcs) or the struct-positional variant
    * (dd_chunk_ledger's ROW access), list SLICING `l[a:b]` (cdc/span
    * chains, ann_matryoshka), QUALIFY and aggregate-ORDER-BY
    * syntax (parse level), quoted date_diff units (q_theil_sen),
    * base64 chunking (q_encode_funcs), INTERVAL arithmetic
    * (q_interval_arith), recursive-CTE UNION semantics (components
    * family — Spark lacks UNION-dedup recursion), and DuckDB
    * list/variant operators with no exact Spark twin — all exercised
    * against DuckDB by the driver instead.
    */
  private val ansiOracles = Seq(
    "ann_brute", "ann_ivf", "ann_ndcg", "ann_range_search",
    "ann_recall_eval", "dd_bag_dedup", "dd_embed_cosine", "dd_exact",
    "dd_semantic", "dd_url_dedup", "hfp_cast", "hfp_dedup_anti",
    "hfp_dedup_bloom", "hfp_dedup_within", "hfp_load_day", "hfp_pipeline",
    "hfp_route", "hfp_union", "mm_binary_stats", "mm_decode_features",
    "mm_frame_sample", "mm_modality_route", "mm_patchify",
    "mm_phash_buckets", "mm_resize", "mm_scene_split",
    "q10_returned_items", "q11_important_parts",
    "q12_priority_conditional", "q13_order_dist", "q14_promo_ratio",
    "q15_top_supplier", "q16_supplier_counts", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_pred", "q1_pricing_summary",
    "q20_promo_suppliers", "q21_late_suppliers", "q22_high_balance",
    "q2_min_cost_supplier", "q2_topk_orders", "q3_shipping_priority",
    "q4_priority_exists", "q5_region_revenue", "q6_selective_agg",
    "q7_bi_nation_volume", "q8_market_share", "q9_product_profit",
    "q_ab_test", "q_anomaly_zscore", "q_anti_join", "q_assoc_rules",
    "q_auc", "q_autocorr", "q_benford", "q_best_of_2", "q_bfs_dist",
    "q_bitwise_funcs",
    "q_brier_score", "q_bucketed_join", "q_calibration",
    "q_changepoint", "q_class_balance",
    "q_clustering_coeff", "q_cochran_q", "q_compaction_plan", "q_cond_funcs",
    "q_confusion_stats", "q_context_chunks", "q_cross_join", "q_cube",
    "q_curriculum", "q_data_card", "q_decay_agg", "q_dedup_keep_latest",
    "q_delta_encoding", "q_distinct_agg", "q_domain_mix", "q_dq_checks",
    "q_empty_agg", "q_entropy", "q_equidepth_bucketize", "q_ess", "q_ewma",
    "q_feature_quantiles", "q_fleiss_kappa", "q_forecast_snaive", "q_forget_user",
    "q_full_outer_join", "q_funnel", "q_gae", "q_gap_fill", "q_gd_train",
    "q_geomean", "q_gini", "q_grouping_sets", "q_hard_negatives",
    "q_having", "q_hist_quantiles", "q_histogram", "q_hybrid_rrf",
    "q_in_subquery", "q_incr_agg", "q_item_cf", "q_json_funcs",
    "q_k_anonymity", "q_kcore", "q_krippendorff", "q_l_diversity",
    "q_label_prop",
    "q_lateral_topn", "q_length_buckets", "q_link_predict",
    "q_mad_outlier", "q_map_struct_funcs", "q_math_extended",
    "q_math_funcs", "q_mcnemar", "q_merge_upsert", "q_mmr_select",
    "q_modularity",
    "q_mutual_information", "q_ngram_overlap", "q_not_in_subquery",
    "q_ohlc", "q_pad_waste", "q_pagerank", "q_pass_at_k",
    "q_path_transitions", "q_percentiles", "q_power_analysis",
    "q_pref_pairs", "q_profile",
    "q_psi", "q_quantile_norm", "q_range_join", "q_range_native", "q_rollup",
    "q_running_distinct", "q_salted_agg", "q_salted_join",
    "q_scalar_subquery", "q_scd2", "q_seasonal_profile", "q_semi_join",
    "q_seq_pack",
    "q_seq_mining", "q_sessionize", "q_set_except", "q_set_intersect",
    "q_skew_profile", "q_skyline", "q_snapshot_diff", "q_sssp",
    "q_stats_agg", "q_string_advanced", "q_string_funcs", "q_survival",
    "q_tail_index", "q_target_encode", "q_temperature_scale",
    "q_token_budget", "q_top_p_cutoff",
    "q_triangle_count", "q_trig_funcs", "q_tumbling_window", "q_typed_agg",
    "q_typed_cogroup", "q_ucb_bandit", "q_union_distinct", "q_unpivot",
    "q_values_lookup", "q_vocab_growth", "q_window_dist", "q_window_first_last",
    "q_window_frame", "q_window_lag", "q_window_rank", "q_winsorize",
    "q_zipf_fit",
    "q_zone_map", "q_zorder", "ta_bm25", "ta_bpe", "ta_cluster_topics",
    "ta_collocations", "ta_heavy_hitters", "ta_ks_test",
    "ta_langid_profile", "ta_nb_langid", "ta_ngram_lm", "ta_oov_rate",
    "ta_perplexity_bucket", "ta_pii_scrub", "ta_pipeline", "ta_quality",
    "ta_readability", "ta_repetition", "ta_sentiment", "ta_stem",
    "ta_textrank", "ta_tfidf", "ta_tfidf_cosine", "ta_wasserstein")

  test("ANSI oracle SQL runs on spark.sql with identical results") {
    val s = sc
    graft.sources.Tables.registerAll(s, sfDir)
    graft.functions.SqlCompat.register(s)
    val failures = ansiOracles.flatMap { name =>
      try {
        val viaSql = s.sql(SparkEntry.oracleSql(name)).collect().toSeq
        val viaDf = SparkEntry.queries(name)(s, sfDir).collect().toSeq
        if (viaSql == viaDf) None else Some(s"$name: rows differ (${viaSql.size} vs ${viaDf.size})")
      } catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
