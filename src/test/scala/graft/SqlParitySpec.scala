package graft

/** SQL-frontend parity: the ANSI oracle statements for the relational
  * query set run unchanged through `spark.sql` and must produce exactly
  * the DataFrame formulation's rows. A user can address this engine in
  * plain SQL (views registered by `Tables.registerAll`) or through the
  * typed API and get identical results — the two entries share Catalyst,
  * so this pins the whole parse→analyze→optimize path, not a re-test of
  * the operators. (Oracles using DuckDB-only list/lambda functions are
  * exercised against DuckDB by the driver instead.)
  */
class SqlParitySpec extends SparkSuite {

  private val ansiOracles = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q6_selective_agg", "q10_returned_items", "q12_priority_conditional",
    "q14_promo_ratio", "q19_disjunctive_pred", "q22_high_balance",
    "q_having", "q_union_distinct", "q_semi_join", "q_anti_join",
    "q_in_subquery", "q_not_in_subquery", "q_scalar_subquery",
    "q_full_outer_join", "q_cross_join", "q_window_rank", "q_window_lag",
    "q_lateral_topn", "q_snapshot_diff",
    "q_ohlc", "q_running_distinct", "q_path_transitions",
    "q_anomaly_zscore", "q_histogram", "q_hist_quantiles", "q_pagerank",
    // round-7 relational oracles
    "q_salted_join", "q_typed_cogroup", "q_skyline", "q_assoc_rules")

  test("ANSI oracle SQL runs on spark.sql with identical results") {
    val s = sc
    graft.sources.Tables.registerAll(s, sfDir)
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
