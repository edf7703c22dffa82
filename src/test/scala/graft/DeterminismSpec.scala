package graft

/** Partitioning-invariance gate: a query's RESULT must not depend on
  * how the engine partitions the work — the property that makes
  * results reproducible across cluster sizes, AQE re-plans, and
  * re-runs. Exercised by running the same queries under different
  * shuffle-partition settings and comparing collected rows exactly
  * (bit-exact doubles included — this is what the quantized-sum
  * technique buys).
  *
  * The subset covers each family where order-dependence could hide:
  * quantized float sums (decay, entropy, maxsim, pagerank), iterative
  * loops (components, kmeans), argmax picks (ohlc, keep_best), sketch
  * pipelines (minhash), and top-k with declared tiebreaks.
  */
class DeterminismSpec extends SparkSuite {

  private val probes = Seq(
    "q_decay_agg", "q_entropy", "ann_maxsim", "q_pagerank",
    "dd_components", "kmeans_train", "q_ohlc", "dd_keep_best",
    "dd_minhash_lsh", "q_weighted_sample", "q_token_budget",
    "ta_bpe_train", "q_hist_quantiles",
    // round-7: kernel-explode ops, mapPartitions skyline, A-priori
    // counting, vote argmax, NB quantized log-likelihood sums
    "dd_winnowing", "q_cdc_chunks", "q_skyline", "q_assoc_rules",
    "q_knn_classify", "ta_nb_langid", "q_geo_trajectory", "q_geo_speed",
    // round-8: DSIR quantized log-ratio sums, banded simhash pair set,
    // blocked-tile exact cosine, URL canonical grouping
    "ta_dsir", "dd_simhash", "dd_embed_cosine", "dd_url_dedup",
    // two-phase rank + quantized regression sums
    "q_zipf_fit", "q_global_shuffle", "ta_textrank", "q_label_prop",
    "mm_resize",
    // round-8c: quantized RAKE sums, sketch set algebra, IVF-bounded
    // votes, windowed first/last mining, chunk first-occurrence argmin,
    // weighted relaxation, kernel tokenization
    "ta_rake", "q_kmv_set_ops", "q_knn_ivf", "q_seq_mining",
    "dd_chunk_ledger", "q_sssp", "ta_wordpiece",
    // round-8d: integer intra-edge/degree aggregates under the float
    // contribution expression; cents-quantized series moments; exact
    // integer CUSUM argmax
    "q_modularity", "q_autocorr", "q_changepoint", "q_compaction_plan",
    // round-9: integer-weight EWMA / Welch moments / lexicon sums; the
    // centroid filter's quantized per-dim means
    "q_ewma", "q_ab_test", "ta_sentiment", "ann_centroid_filter",
    // round-9b: integer constraint/purge counters; fixed-weight logit
    // chains; landmark-pair hash buckets
    "q_dq_checks", "q_forget_user", "ta_quality_lr", "mm_audio_fingerprint",
    // round-11: decimal regression sums, CMS grid, GD quantized
    // gradients, cell-graph label loop, ALS quantized normal equations,
    // DCT quantized term sums, UCB rounded argmax
    "q_ols", "q_cms_heavy", "q_item_cf", "q_gd_train", "q_dbscan_grid",
    "q_als_step", "q_ucb_bandit", "q_seasonal_profile", "mm_mfcc",
    // round-11b: global rank sums, ntile bucketing, hash-seeded noise
    "q_auc", "q_calibration", "q_rfm", "q_dp_counts", "ann_ndcg",
    // round-11c: kernel cosine chains, quantized MAE sums, cluster
    // labeling, entropy quantization
    "mm_clip_filter", "q_forecast_snaive", "ta_cluster_topics", "q_data_card",
    // round-11d: regexp-ratio scoring, span-mask set algebra
    "ta_code_detect", "q_span_corrupt",
    // round-6 second session: fixed-point power iteration (integer
    // G·v reductions + exact floor-div renorm), band-signature
    // sums/xors, value-histogram rank cuts, quantized sparse dots
    "q_pca_power", "q_pca_project", "q_pca_deflate", "q_feature_quantiles",
    "dd_supershingle", "ta_perplexity_bucket", "ta_tfidf_cosine",
    // Poisson-bootstrap hash weights + rank-cut intervals; quantized
    // MI log sums; integer ECDF cross-products
    "q_bootstrap_ci", "q_mutual_information", "ta_ks_test",
    // round-10: sorted-fold MM denominators (BT) and cell sums (chi2,
    // reweight); quantized pass@k / BLEU averages; DECIMAL-decomposed
    // winsorized means; integer agreement coefficients; unrolled
    // greedy MMR argmaxes; per-shard packing cumsums
    "q_bradley_terry", "q_pass_at_k", "q_ngram_overlap", "q_winsorize",
    "q_fleiss_kappa", "q_krippendorff", "q_chi2_independence",
    "q_domain_reweight", "q_mmr_select", "q_seq_pack", "q_pref_pairs",
    "q_split_leakage", "q_quantile_norm",
    // round-10 serving wave: fixed-tree lead sums + quantized means;
    // quantized NLL grid argmin; DECIMAL order-statistics sums;
    // DECIMAL cumulative-mass threshold argmin
    "q_gae", "q_temperature_scale", "q_best_of_2", "q_top_p_cutoff",
    // first-touch expanding distinct + quantized Heaps OLS; min-distance
    // histogram running sums over the banded pair relation
    "q_vocab_growth", "dd_threshold_curve",
    // round-11: per-scene keyframe argmax (integer cross-multiplied
    // score, explicit frame tie-break); cross-split min/min aggregates
    // over the phash-blocked pair relation
    "mm_keyframes", "mm_cross_contam",
    // round-11b: quantized per-dim variance/mean folds; bucket-rate
    // quantized stratification; first-reject keyed argmin
    "q_grad_noise_scale", "q_length_debiased_winrate", "q_spec_decode_accept",
    // round-11c: per-budget GroupedTopK over double cosines; τ-sorted
    // normalizer folds; negated-margin heap selection
    "ann_recall_curve", "q_mixture_temperature", "q_active_learning_margin")

  test("results are identical under different shuffle partitionings") {
    val conf = spark.conf
    probes.foreach { name =>
      conf.set("spark.sql.shuffle.partitions", "3")
      val a = SparkEntry.queries(name)(sc, sfDir).collect().map(_.toSeq)
      conf.set("spark.sql.shuffle.partitions", "17")
      val b = SparkEntry.queries(name)(sc, sfDir).collect().map(_.toSeq)
      conf.set("spark.sql.shuffle.partitions", "4")
      assert(a.length == b.length, s"$name: row count differs")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"$name row $i differs:\n  3 parts: $ra\n  17 parts: $rb")
      }
    }
  }
}
