package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Mixture-of-Experts routing diagnostics — the telemetry a sparse-
  * architecture serving/training stack reads off its router: per-layer
  * expert load balance and the Switch Transformer auxiliary loss
  * (Fedus, Zoph & Shazeer, "Switch Transformers", JMLR 2022, eq. 4),
  * capacity-factor token drops (ibid. §2.2 — tokens past an expert's
  * per-batch capacity are NOT processed), and cross-layer routing
  * churn (the router-stability readout of Dai et al., "StableMoE",
  * ACL 2022). Events are the token stream: event_id = token,
  * user_id = batch; router logits are portable hashes, so every
  * number is reproducible across engines and partitionings.
  * Reference scope: none in the reference (an ETL loader).
  *
  * The scale discipline: scores for all [[NumExperts]] experts, the
  * top-1 argmax, and the per-layer expert path are computed IN-ROW
  * (higher-order functions over a literal expert sequence — no
  * window, no self-join), so q_moe_load_balance and
  * q_moe_routing_churn reach their dimension-sized aggregates with
  * ZERO data-sized shuffles, and q_moe_capacity_drops pays exactly
  * one — the (batch, layer) exchange its per-batch capacity ranking
  * genuinely requires (both its windows key on prefixes/supersets of
  * that clustering — NOTES #52).
  *
  * Determinism (NOTES #35): logits are hash BIGINTs; router
  * probabilities are quantized to integer 2⁻²⁰ units by integer
  * division BEFORE any cross-row sum (the q_grad_noise_scale
  * pattern); the aux-loss fold over the 8 per-expert terms is
  * VALUE-SORTED (NOTES #48a); ties in the argmax break to the lowest
  * expert index via first-match array_position on both engines.
  */
object MoeOps {

  /** Experts per layer (Switch routes top-1 of 8 in the base config). */
  private val NumExperts = 8

  /** Router layers audited. */
  private val NumLayers = 4

  /** Eval capacity factor ×100 (Switch §2.2 uses 1.25 at eval). */
  private val CapacityPct = 125

  /** Router probability quantum: probs are folded as integer
    * multiples of 2⁻²⁰, so cross-row sums are exact BIGINT arithmetic.
    */
  private val ProbQ = 1L << 20

  /** In-row router logits for one (token, layer): a [[NumExperts]]-long
    * BIGINT array, logit = h64("moe:layer:expert:token") % 1000 + 1
    * (strictly positive so the normalizer never degenerates).
    */
  private def logitsCol: Column =
    transform(sequence(lit(0), lit(NumExperts - 1)),
      e => PortableHash.hash64(concat(lit("moe:"), col("l"), lit(":"), e,
        lit(":"), col("event_id"))) % 1000 + 1)

  private def logitsSql(l: String, id: String): String = {
    val h = PortableHash.sql(
      s"'moe:' || CAST($l AS STRING) || ':' || CAST(e AS STRING) || ':' || CAST($id AS STRING)")
    s"list_transform(generate_series(0, ${NumExperts - 1}), e -> $h % 1000 + 1)"
  }

  /** Layer grid both engines spell as a literal VALUES relation. */
  private def layerGrid(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until NumLayers).toDF("l")
  }

  private val layerGridSql =
    (0 until NumLayers).map(l => s"($l)").mkString("(VALUES ", ", ", ") lg(l)")

  // ---------------------------------------------- q_moe_load_balance

  /** Per-(layer, expert) load balance + the Switch auxiliary loss:
    * f_i (fraction of tokens top-1-routed to expert i), P_i (mean
    * router probability mass on i — probs quantized to [[ProbQ]]ths
    * in-row, summed as integers), and the per-layer
    * aux = N·Σᵢ fᵢ·Pᵢ (= 1 for a perfectly uniform router — the value
    * training multiplies by α as the load-balancing loss). Shape: the
    * token scan cross-joins the broadcast layer grid and the
    * broadcast expert grid; logits array, normalizer and argmax are
    * in-row; ONE map-side-combinable aggregate lands on
    * layers × experts = 32 rows, and the aux fold is a value-sorted
    * 8-term sum over that tiny relation joined back broadcast.
    */
  def qMoeLoadBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val experts = (0 until NumExperts).toDF("expert")
    val routed = Tables(s, dir, "events")
      .select(col("event_id"))
      .crossJoin(broadcast(layerGrid(s)))
      .withColumn("arr", logitsCol)
      .withColumn("s_sum", aggregate(col("arr"), lit(0L), (acc, x) => acc + x))
      .withColumn("top1", array_position(col("arr"), array_max(col("arr"))) - 1)
      .crossJoin(broadcast(experts))
      .select(col("l").as("layer"), col("expert"),
        when(col("top1") === col("expert"), 1L).otherwise(0L).as("is_top"),
        // integer 2^-20 probability units, truncated — exact cross-row
        expr(s"element_at(arr, expert + 1) * $ProbQ div s_sum").as("p_q"))
    // perExpert (layers × experts = 32 rows) feeds BOTH the aux fold
    // and the final join, sharing the token scan through AQE
    // exchange-reuse (the identical agg subtrees canonicalize to one
    // exchange). Reuse is an optimizer behavior, not a contract, so
    // PlanAuditSpec pins a ReusedExchange in the executed plan — the
    // structural alternative, localCheckpoint'ing the 32 rows, was
    // measured 3× SLOWER end-to-end (2.2 s vs 0.65 s at sf0.1: the
    // checkpoint pays toRdd materialization + block-store round trip
    // where reuse just re-reads one 32-row shuffle), so the gate is a
    // test, not a plan node.
    val perExpert = routed.groupBy("layer", "expert")
      .agg(count(lit(1)).as("n_tokens"), sum("is_top").as("n_top1"),
        sum("p_q").as("sum_pq"))
    val aux = perExpert
      .select(col("layer"),
        ((col("n_top1") * NumExperts).cast(DoubleType) / col("n_tokens") *
          (col("sum_pq").cast(DoubleType) / col("n_tokens") / ProbQ)).as("term"))
      .groupBy("layer")
      .agg(sort_array(collect_list("term")).as("terms"))
      .select(col("layer"),
        round(aggregate(col("terms"), lit(0.0), (acc, x) => acc + x), 6)
          .as("aux_loss"))
    perExpert.join(broadcast(aux), "layer")
      .select(col("layer"), col("expert"), col("n_tokens"), col("n_top1"),
        round(col("n_top1").cast(DoubleType) / col("n_tokens"), 6)
          .as("frac_top1"),
        round(col("sum_pq").cast(DoubleType) / col("n_tokens") / ProbQ, 6)
          .as("mean_prob"),
        col("aux_loss"))
      .orderBy("layer", "expert")
  }

  private val qMoeLoadBalanceSql = {
    val eg = (0 until NumExperts).map(e => s"($e)").mkString("(VALUES ", ", ", ") eg(expert)")
    s"""WITH toks AS (SELECT event_id, l,
       |    ${logitsSql("l", "event_id")} AS arr
       |  FROM events CROSS JOIN $layerGridSql),
       |scored AS (SELECT event_id, l, arr,
       |    CAST(list_aggregate(arr, 'sum') AS BIGINT) AS s_sum,
       |    list_position(arr, list_max(arr)) - 1 AS top1
       |  FROM toks),
       |routed AS (SELECT l AS layer, expert,
       |    CASE WHEN top1 = expert THEN 1 ELSE 0 END AS is_top,
       |    divide(list_extract(arr, expert + 1) * $ProbQ, s_sum) AS p_q
       |  FROM scored CROSS JOIN $eg),
       |pe AS (SELECT layer, expert, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(is_top) AS BIGINT) AS n_top1,
       |    CAST(SUM(p_q) AS BIGINT) AS sum_pq
       |  FROM routed GROUP BY 1, 2),
       |aux AS (SELECT layer,
       |    round(list_aggregate(list_sort(array_agg(
       |      CAST(n_top1 * $NumExperts AS DOUBLE) / n_tokens *
       |        (CAST(sum_pq AS DOUBLE) / n_tokens / $ProbQ))), 'sum'), 6)
       |      AS aux_loss
       |  FROM pe GROUP BY layer)
       |SELECT pe.layer, pe.expert, pe.n_tokens, pe.n_top1,
       |  round(CAST(pe.n_top1 AS DOUBLE) / pe.n_tokens, 6) AS frac_top1,
       |  round(CAST(pe.sum_pq AS DOUBLE) / pe.n_tokens / $ProbQ, 6) AS mean_prob,
       |  aux.aux_loss
       |FROM pe JOIN aux ON aux.layer = pe.layer
       |ORDER BY pe.layer, pe.expert""".stripMargin
  }

  // -------------------------------------------- q_moe_capacity_drops

  /** Capacity-factor drop audit: within each batch (user) and layer,
    * an expert processes at most
    * ceil(capacity_factor · batch_tokens / experts) of the tokens
    * top-1-routed to it, highest router logit first (ties to the
    * earlier token) — the rest are DROPPED (skip the layer via the
    * residual connection, Switch §2.2). Per (layer, expert): routed
    * tokens, dropped tokens, drop fraction. The capacity ceiling is
    * exact integer arithmetic (⌈a/b⌉ = (a + b − 1) div b). Shape:
    * in-row argmax (no expert fan-out at all), then ONE exchange on
    * (batch, layer) carrying both windows — the batch-size count
    * keys on (user_id, l) and the per-expert ranking on
    * (user_id, l, top1), a superset of the clustering (NOTES #52) —
    * then the 32-row aggregate.
    */
  def qMoeCapacityDrops(s: SparkSession, dir: String): DataFrame = {
    val wBatch = Window.partitionBy("user_id", "l")
    val wExpert = Window.partitionBy("user_id", "l", "top1")
      .orderBy(col("top_logit").desc, col("event_id"))
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"))
      .crossJoin(broadcast(layerGrid(s)))
      .withColumn("arr", logitsCol)
      .withColumn("top1", array_position(col("arr"), array_max(col("arr"))) - 1)
      .withColumn("top_logit", array_max(col("arr")))
      .withColumn("n_batch", count(lit(1)).over(wBatch))
      .withColumn("cap", expr(
        s"(n_batch * $CapacityPct + ${NumExperts * 100 - 1}) div ${NumExperts * 100}"))
      .withColumn("rk", row_number().over(wExpert))
      .groupBy(col("l").as("layer"),
        col("top1").cast(IntegerType).as("expert"))
      .agg(count(lit(1)).as("n_routed"),
        sum(when(col("rk") > col("cap"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("layer"), col("expert"), col("n_routed"), col("n_dropped"),
        round(col("n_dropped").cast(DoubleType) / col("n_routed"), 6)
          .as("drop_frac"))
      .orderBy("layer", "expert")
  }

  private val qMoeCapacityDropsSql =
    s"""WITH toks AS (SELECT event_id, user_id, l,
       |    ${logitsSql("l", "event_id")} AS arr
       |  FROM events CROSS JOIN $layerGridSql),
       |scored AS (SELECT event_id, user_id, l,
       |    list_position(arr, list_max(arr)) - 1 AS top1,
       |    list_max(arr) AS top_logit
       |  FROM toks),
       |ranked AS (SELECT l, top1,
       |    divide(COUNT(*) OVER (PARTITION BY user_id, l) * $CapacityPct
       |      + ${NumExperts * 100 - 1}, ${NumExperts * 100}) AS cap,
       |    row_number() OVER (PARTITION BY user_id, l, top1
       |      ORDER BY top_logit DESC, event_id) AS rk
       |  FROM scored)
       |SELECT l AS layer, top1 AS expert, CAST(COUNT(*) AS BIGINT) AS n_routed,
       |  CAST(SUM(CASE WHEN rk > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  round(CAST(SUM(CASE WHEN rk > cap THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS drop_frac
       |FROM ranked GROUP BY 1, 2 ORDER BY layer, expert""".stripMargin

  // -------------------------------------------- q_moe_routing_churn

  /** Cross-layer routing churn (StableMoE's stability concern): the
    * fraction of tokens whose top-1 expert CHANGES between
    * consecutive layers. The whole per-token expert path is one
    * in-row array (nested higher-order functions — argmax per layer
    * over the literal layer sequence), the 3 layer transitions
    * fan out over a broadcast grid, and the readout is a 3-row
    * aggregate: zero data-sized shuffles end to end. (Logit ties
    * inside a layer — possible at %1000 granularity — resolve to the
    * lowest expert index on both engines via first-match
    * array_position, so the path itself is reproducible.)
    */
  def qMoeRoutingChurn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = (0 until NumLayers - 1).toDF("lf")
    val path = transform(sequence(lit(0), lit(NumLayers - 1)), l => {
      val arr = transform(sequence(lit(0), lit(NumExperts - 1)),
        e => PortableHash.hash64(concat(lit("moe:"), l, lit(":"), e,
          lit(":"), col("event_id"))) % 1000 + 1)
      array_position(arr, array_max(arr)) - 1
    })
    Tables(s, dir, "events")
      .select(col("event_id"))
      .withColumn("path", path)
      .crossJoin(broadcast(pairs))
      .select(col("lf").as("layer_from"),
        when(element_at(col("path"), col("lf") + 1) =!=
          element_at(col("path"), col("lf") + 2), 1L).otherwise(0L)
          .as("changed"))
      .groupBy("layer_from")
      .agg(count(lit(1)).as("n_tokens"), sum("changed").as("n_changed"))
      .select(col("layer_from"), col("n_tokens"), col("n_changed"),
        round(col("n_changed").cast(DoubleType) / col("n_tokens"), 6)
          .as("churn_frac"))
      .orderBy("layer_from")
  }

  private val qMoeRoutingChurnSql = {
    val pg = (0 until NumLayers - 1).map(l => s"($l)").mkString("(VALUES ", ", ", ") pg(lf)")
    val inner = logitsSql("l", "event_id")
    s"""WITH paths AS (SELECT event_id,
       |    list_transform(generate_series(0, ${NumLayers - 1}), l ->
       |      list_position($inner, list_max($inner)) - 1) AS path
       |  FROM events),
       |trans AS (SELECT lf,
       |    CASE WHEN list_extract(path, lf + 1) <> list_extract(path, lf + 2)
       |      THEN 1 ELSE 0 END AS changed
       |  FROM paths CROSS JOIN $pg)
       |SELECT lf AS layer_from, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(changed) AS BIGINT) AS n_changed,
       |  round(CAST(SUM(changed) AS DOUBLE) / COUNT(*), 6) AS churn_frac
       |FROM trans GROUP BY lf ORDER BY layer_from""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_moe_load_balance" -> (qMoeLoadBalance(_, _)),
    "q_moe_capacity_drops" -> (qMoeCapacityDrops(_, _)),
    "q_moe_routing_churn" -> (qMoeRoutingChurn(_, _)))

  def oracles: Map[String, String] = Map(
    "q_moe_load_balance" -> qMoeLoadBalanceSql,
    "q_moe_capacity_drops" -> qMoeCapacityDropsSql,
    "q_moe_routing_churn" -> qMoeRoutingChurnSql)
}
