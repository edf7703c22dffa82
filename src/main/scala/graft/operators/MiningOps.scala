package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Pattern-mining operators — frequent-itemset rules over transaction
  * data and nearest-neighbor classification over the embedding table:
  *
  *  - `q_assoc_rules`: market-basket association rules (A-priori,
  *    Agrawal & Srikant VLDB'94) on per-order part-brand baskets.
  *    Singleton counts prune the candidate set BEFORE pair generation
  *    (an item below min-support cannot appear in a frequent pair), so
  *    the self-join runs over the frequent-item subset only. Support /
  *    confidence thresholds are applied as cross-multiplied INTEGER
  *    comparisons (`n_ab * 200 >= n_orders`), so no float rounding can
  *    flip a boundary row between engines; the reported support /
  *    confidence / lift are single identically-written divisions
  *    rounded at 1e-6.
  *  - `q_knn_classify`: k-NN majority-vote classification of a held-out
  *    query slice of the embeddings table against the labeled rest,
  *    reported as a confusion matrix. The per-query top-k runs through
  *    the custom GroupedTopK exec (per-group bounded heaps, no sort),
  *    the vote argmax is a map-side-combining `min(struct(-votes,
  *    label))`, and both tie levels are deterministic: neighbor ties →
  *    smallest vec_id, vote ties → smallest label.
  *
  * Scale notes: assoc-rules shuffles are bounded by Σ|basket|² after
  * frequent-item pruning — the standard A-priori candidate bound; the
  * brand dimension is broadcast. k-NN classification broadcasts the
  * query slice (queries ≪ corpus) and streams the corpus once;
  * per-group state is the k-element heap, never the full candidate
  * list. At 100 TB the corpus side stays partition-parallel with no
  * shuffle at all until the (|queries|·k)-row vote table.
  *
  * Reference scope: the reference (HSLdevcom/hfp-loader) has no mining
  * operators (SURVEY.md §2) — north-star extensions per SURVEY.md §7.
  */
object MiningOps {

  // ------------------------------------------------------------ assoc rules

  // thresholds as exact integer cross-multiplications:
  //   support  >= 1/200 of orders   <=>  n_ab * 200 >= n_orders
  //   confidence >= 1/10            <=>  n_ab * 10  >= n_a
  private val SupDen = 200L
  private val ConfDen = 10L

  def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("oid"), col("l_partkey"))
      // no broadcast hint: part is a dim that GROWS with scale factor —
      // AQE broadcasts while small, shuffles beyond the threshold
      .join(Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand").as("item")),
        col("l_partkey") === col("p_partkey"))
      .select("oid", "item").distinct()
    // deliberately NOT cached: the four consuming branches share the
    // distinct's exchange via ReusedExchange already, and a cache
    // A/B'd 1.7x SLOWER (r6) — the coalesced InMemoryRelation starves
    // the pairing self-join of partitions (the ddSimhash pathology)
    // while the broadcast branches lose their runtime-sized plans
    val nOrders = baskets.select("oid").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val items = baskets.groupBy("item").agg(count(lit(1)).as("n_item"))
    // A-priori prune: only items meeting min-support can form frequent pairs
    val frequent = items.crossJoin(broadcast(nOrders))
      .where(col("n_item") * SupDen >= col("n_orders"))
      .select("item", "n_item")
    val fb = baskets.join(broadcast(frequent.select("item")), "item")
    val pairs = fb.select(col("oid"), col("item").as("a"))
      .join(fb.select(col("oid"), col("item").as("b")), "oid")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    // emit both rule directions from each unordered frequent pair
    val rules = pairs.select(col("a").as("antecedent"), col("b").as("consequent"), col("n_ab"))
      .union(pairs.select(col("b").as("antecedent"), col("a").as("consequent"), col("n_ab")))
    rules
      .join(broadcast(frequent.select(col("item").as("antecedent"), col("n_item").as("n_a"))), "antecedent")
      .join(broadcast(frequent.select(col("item").as("consequent"), col("n_item").as("n_b"))), "consequent")
      .crossJoin(broadcast(nOrders))
      .where(col("n_ab") * SupDen >= col("n_orders") &&
        col("n_ab") * ConfDen >= col("n_a"))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        round(col("n_ab").cast(DoubleType) / col("n_orders"), 6).as("support"),
        round(col("n_ab").cast(DoubleType) / col("n_a"), 6).as("confidence"),
        round((col("n_ab") * col("n_orders")).cast(DoubleType) /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy("antecedent", "consequent")
  }

  private val qAssocRulesSql =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l.l_orderkey AS oid, p.p_brand AS item
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |n AS (SELECT COUNT(DISTINCT oid) AS n_orders FROM baskets),
       |items AS (SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY item),
       |frequent AS (
       |  SELECT item, n_item FROM items, n WHERE n_item * $SupDen >= n_orders),
       |fb AS (SELECT b.oid, b.item FROM baskets b JOIN frequent f USING (item)),
       |pairs AS (
       |  SELECT x.item AS a, y.item AS b, COUNT(*) AS n_ab
       |  FROM fb x JOIN fb y ON x.oid = y.oid AND x.item < y.item
       |  GROUP BY 1, 2),
       |rules AS (
       |  SELECT a AS antecedent, b AS consequent, n_ab FROM pairs
       |  UNION ALL
       |  SELECT b AS antecedent, a AS consequent, n_ab FROM pairs)
       |SELECT r.antecedent, r.consequent, r.n_ab,
       |  round(CAST(r.n_ab AS DOUBLE) / n.n_orders, 6) AS support,
       |  round(CAST(r.n_ab AS DOUBLE) / fa.n_item, 6) AS confidence,
       |  round(CAST(r.n_ab * n.n_orders AS DOUBLE) / (fa.n_item * fb2.n_item), 6) AS lift
       |FROM rules r
       |JOIN frequent fa ON r.antecedent = fa.item
       |JOIN frequent fb2 ON r.consequent = fb2.item
       |CROSS JOIN n
       |WHERE r.n_ab * $SupDen >= n.n_orders AND r.n_ab * $ConfDen >= fa.n_item
       |ORDER BY antecedent, consequent""".stripMargin

  // ----------------------------------------------------------- knn classify

  private val KnnK = 5
  private val TestMod = 25 // vec_id % 25 == 0 → held-out query slice

  private def dotSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
  private def normSql(a: String) =
    s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  def qKnnClassify(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        sqrt(expr("graft_norm_sq_f(embedding)")).as("nrm"))
    val test = e.where(col("vec_id") % TestMod === 0)
      .select(col("vec_id").as("qid"), col("label").as("true_label"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val train = e.where(col("vec_id") % TestMod =!= 0)
    // corpus side streams once against the broadcast query slice; the
    // per-(query) top-k runs in bounded heaps (GroupedTopK), never a sort
    val pairs = train.crossJoin(broadcast(test))
      .select(col("qid"), col("vec_id").as("nbr"), col("label").as("nbr_label"),
        (expr("graft_dot_f(embedding, qe)") / (col("nrm") * col("qn"))).as("cosine"))
    val topk = graft.plans.GroupedTopK(
      pairs, s, Seq(col("qid")), col("cosine"), col("nbr"), KnnK)
    val pred = topk.groupBy("qid", "nbr_label")
      .agg(count(lit(1)).as("votes"))
      .groupBy("qid")
      .agg(min(struct((-col("votes")).as("nv"), col("nbr_label").as("lbl"))).as("b"))
      .select(col("qid"), col("b.lbl").as("predicted"))
    test.select("qid", "true_label").join(pred, "qid")
      .groupBy("true_label", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("true_label", "predicted")
  }

  private val qKnnClassifySql =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |test AS (
       |  SELECT vec_id AS qid, label AS true_label, embedding AS qe, nrm AS qn
       |  FROM e WHERE vec_id % $TestMod = 0),
       |train AS (SELECT * FROM e WHERE vec_id % $TestMod <> 0),
       |pairs AS (
       |  SELECT t.qid, tr.vec_id AS nbr, tr.label AS nbr_label,
       |    ${dotSql("tr.embedding", "t.qe")} / (tr.nrm * t.qn) AS cosine
       |  FROM train tr CROSS JOIN test t),
       |topk AS (
       |  SELECT qid, nbr, nbr_label FROM (
       |    SELECT qid, nbr, nbr_label, row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, nbr ASC) AS rk
       |    FROM pairs) rp
       |  WHERE rk <= $KnnK),
       |votes AS (
       |  SELECT qid, nbr_label, COUNT(*) AS votes FROM topk GROUP BY 1, 2),
       |pred AS (
       |  SELECT qid, nbr_label AS predicted FROM (
       |    SELECT qid, nbr_label, row_number() OVER (PARTITION BY qid
       |      ORDER BY votes DESC, nbr_label ASC) AS rk FROM votes) WHERE rk = 1)
       |SELECT t.true_label, p.predicted, COUNT(*) AS n
       |FROM test t JOIN pred p USING (qid)
       |GROUP BY 1, 2 ORDER BY true_label, predicted""".stripMargin

  // --------------------------------------------------------------- q_mrr

  /** Mean reciprocal rank of the kNN retrieval against the held-out
    * labels: for each test query, the rank (within the top-[[KnnK]]
    * list) of the FIRST neighbor sharing its label; MRR averages the
    * reciprocal ranks, zero for label-miss queries. The ranker is the
    * same bounded-heap top-k the classifier uses; the rank window only
    * ever sees k rows per query. Reciprocal ranks are 10⁻⁶-quantized
    * integers (rank ≤ k, so the table of values is tiny and exact);
    * the mean is one final division.
    */
  def qMrr(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        sqrt(expr("graft_norm_sq_f(embedding)")).as("nrm"))
    val test = e.where(col("vec_id") % TestMod === 0)
      .select(col("vec_id").as("qid"), col("label").as("true_label"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val train = e.where(col("vec_id") % TestMod =!= 0)
    val pairs = train.crossJoin(broadcast(test))
      .select(col("qid"), col("vec_id").as("nbr"), col("label").as("nbr_label"),
        (expr("graft_dot_f(embedding, qe)") / (col("nrm") * col("qn"))).as("cosine"))
    val topk = graft.plans.GroupedTopK(
      pairs, s, Seq(col("qid")), col("cosine"), col("nbr"), KnnK)
    val ranked = topk.withColumn("rnk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("qid")
        .orderBy(desc("cosine"), asc("nbr"))).cast(LongType))
    val firstHit = ranked
      .join(test.select(col("qid"), col("true_label")), "qid")
      .where(col("nbr_label") === col("true_label"))
      .groupBy("qid").agg(min("rnk").as("first_rank"))
    test.select("qid").join(firstHit, Seq("qid"), "left")
      .select(when(col("first_rank").isNotNull,
        floor(round(lit(1.0) / col("first_rank"), 6) * 1000000L + 0.5).cast(LongType))
        .otherwise(0L).as("rr_q"),
        when(col("first_rank").isNotNull, 1L).otherwise(0L).as("hit"))
      .agg(count(lit(1)).as("n_queries"), sum("hit").as("n_hit"),
        sum("rr_q").as("rr_sum_q"))
      .select(col("n_queries"), col("n_hit"),
        round(col("rr_sum_q").cast(DoubleType) / 1000000.0 /
          col("n_queries").cast(DoubleType), 6).as("mrr"))
  }

  private val qMrrSql =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |test AS (
       |  SELECT vec_id AS qid, label AS true_label, embedding AS qe, nrm AS qn
       |  FROM e WHERE vec_id % $TestMod = 0),
       |train AS (SELECT * FROM e WHERE vec_id % $TestMod <> 0),
       |pairs AS (
       |  SELECT t.qid, tr.vec_id AS nbr, tr.label AS nbr_label,
       |    ${dotSql("tr.embedding", "t.qe")} / (tr.nrm * t.qn) AS cosine
       |  FROM train tr CROSS JOIN test t),
       |ranked AS (
       |  SELECT qid, nbr_label, rnk FROM (
       |    SELECT qid, nbr_label,
       |      CAST(row_number() OVER (PARTITION BY qid
       |        ORDER BY cosine DESC, nbr ASC) AS BIGINT) AS rnk
       |    FROM pairs) rp
       |  WHERE rnk <= $KnnK),
       |fh AS (
       |  SELECT r.qid, CAST(MIN(r.rnk) AS BIGINT) AS first_rank
       |  FROM ranked r JOIN test t USING (qid)
       |  WHERE r.nbr_label = t.true_label GROUP BY r.qid),
       |rr AS (
       |  SELECT CASE WHEN fh.first_rank IS NOT NULL
       |    THEN CAST(floor(round(1.0 / fh.first_rank, 6) * 1000000 + 0.5) AS BIGINT)
       |    ELSE 0 END AS rr_q,
       |    CASE WHEN fh.first_rank IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM test LEFT JOIN fh USING (qid))
       |SELECT COUNT(*) AS n_queries, CAST(SUM(hit) AS BIGINT) AS n_hit,
       |  round(CAST(SUM(rr_q) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS mrr
       |FROM rr""".stripMargin

  // ------------------------------------------------------- knn classify, IVF

  private val KnnNProbe = 2
  private val KnnCentMod = 50 // vec_id % 50 == 0 → deterministic centroids

  /** [[qKnnClassify]] with the candidate set bounded by IVF cells — the
    * 100 TB shape: instead of streaming the whole corpus past every
    * query, each query probes its [[KnnNProbe]] nearest coarse cells
    * (same deterministic centroid seeding and argmax cell assignment as
    * `ann_ivf`, so the session-cached [[Similarity.assignCells]] plan is
    * shared) and only vectors in probed cells enter the top-k heaps.
    * Candidates per query ≈ nProbe/nCells of the corpus, and the
    * probe→candidate step is a hash join on the cell id, not a cross
    * join. The oracle replicates cell assignment, probing, and voting
    * exactly; predictions may legitimately differ from the brute
    * variant (IVF is approximate) — both engines compute the SAME
    * approximation, so the confusion matrix still hash-matches.
    */
  def qKnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withNorm(s, Tables(s, dir, "embeddings"))
    val centroids = e.where(col("vec_id") % KnnCentMod === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
    val labels = Tables(s, dir, "embeddings").select("vec_id", "label")
    val test = cells.where(col("vec_id") % TestMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    // per-query probe list: top-NProbe cells by centroid cosine — a
    // |queries|×|centroids| broadcast product cut down by the same
    // bounded-heap exec the neighbor top-k uses
    val probe = graft.plans.GroupedTopK(
      test.crossJoin(broadcast(centroids))
        .select(col("qid"), col("qe"), col("qn"), col("cid"),
          (expr("graft_dot_f(qe, ce)") / (col("qn") * col("cn"))).as("cos_c")),
      s, Seq(col("qid")), col("cos_c"), col("cid"), KnnNProbe)
      .select(col("qid"), col("qe"), col("qn"), col("cid").as("cell"))
    // candidates = probed cells only — a hash join on the cell id; the
    // train side never meets queries outside their probe list
    val cand = cells
      .where(col("vec_id") % TestMod =!= 0)
      .join(probe, "cell")
      .join(labels.withColumnRenamed("vec_id", "cand_id"),
        col("vec_id") === col("cand_id"))
      .select(col("qid"), col("vec_id").as("nbr"), col("label").as("nbr_label"),
        (expr("graft_dot_f(embedding, qe)") / (col("nrm") * col("qn"))).as("cosine"))
    val topk = graft.plans.GroupedTopK(
      cand, s, Seq(col("qid")), col("cosine"), col("nbr"), KnnK)
    val pred = topk.groupBy("qid", "nbr_label")
      .agg(count(lit(1)).as("votes"))
      .groupBy("qid")
      .agg(min(struct((-col("votes")).as("nv"), col("nbr_label").as("lbl"))).as("b"))
      .select(col("qid"), col("b.lbl").as("predicted"))
    labels.where(col("vec_id") % TestMod === 0)
      .select(col("vec_id").as("qid"), col("label").as("true_label"))
      .join(pred, "qid")
      .groupBy("true_label", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("true_label", "predicted")
  }

  private val qKnnIvfSql =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn
       |         FROM e WHERE vec_id % $KnnCentMod = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cell FROM (
       |    SELECT e.vec_id, e.embedding, e.nrm, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dotSql("e.embedding", "cent.ce")} / (e.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM e CROSS JOIN cent) WHERE rk = 1),
       |test AS (
       |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn
       |  FROM assigned WHERE vec_id % $TestMod = 0),
       |probe AS (
       |  SELECT qid, qe, qn, cid AS cell FROM (
       |    SELECT t.qid, t.qe, t.qn, cent.cid,
       |      row_number() OVER (PARTITION BY t.qid
       |        ORDER BY ${dotSql("t.qe", "cent.ce")} / (t.qn * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM test t CROSS JOIN cent) WHERE rk <= $KnnNProbe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS nbr, l.label AS nbr_label,
       |    ${dotSql("a.embedding", "p.qe")} / (a.nrm * p.qn) AS cosine
       |  FROM assigned a JOIN probe p ON a.cell = p.cell
       |  JOIN e l ON a.vec_id = l.vec_id
       |  WHERE a.vec_id % $TestMod <> 0),
       |topk AS (
       |  SELECT qid, nbr, nbr_label FROM (
       |    SELECT qid, nbr, nbr_label, row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, nbr ASC) AS rk
       |    FROM cand) rc
       |  WHERE rk <= $KnnK),
       |votes AS (
       |  SELECT qid, nbr_label, COUNT(*) AS votes FROM topk GROUP BY 1, 2),
       |pred AS (
       |  SELECT qid, nbr_label AS predicted FROM (
       |    SELECT qid, nbr_label, row_number() OVER (PARTITION BY qid
       |      ORDER BY votes DESC, nbr_label ASC) AS rk FROM votes) WHERE rk = 1)
       |SELECT t.label AS true_label, p.predicted, COUNT(*) AS n
       |FROM e t JOIN pred p ON t.vec_id = p.qid
       |GROUP BY 1, 2 ORDER BY true_label, predicted""".stripMargin

  // --------------------------------------------------------------- skyline

  case class CustPoint(c: Long, total: Double, n: Long)

  /** 2-D skyline scan over one partition's points: sort by (total desc,
    * n desc), then a point survives iff its group (same total) carries
    * a strictly higher n than every strictly-higher total seen so far —
    * the standard sort-scan with exact tie semantics (equal-on-both
    * points don't dominate each other, so whole ties survive together).
    */
  private def localSkyline(it: Iterator[CustPoint]): Iterator[CustPoint] = {
    val pts = it.toArray.sortBy(p => (-p.total, -p.n, p.c))
    val out = scala.collection.mutable.ArrayBuffer.empty[CustPoint]
    var maxNPrev = Long.MinValue // max n among strictly-greater totals
    var i = 0
    while (i < pts.length) {
      var j = i // [i, j) = one equal-total group
      while (j < pts.length && pts(j).total == pts(i).total) j += 1
      val groupMaxN = pts(i).n // sorted n desc within the group
      if (groupMaxN > maxNPrev) {
        var g = i
        while (g < j && pts(g).n == groupMaxN) { out += pts(g); g += 1 }
      }
      if (groupMaxN > maxNPrev) maxNPrev = groupMaxN
      i = j
    }
    out.iterator
  }

  /** Pareto-skyline of customers on (total spent ↑, order count ↓ —
    * "most revenue from fewest orders", anti-correlated so the
    * frontier is non-trivial):
    * the dominance filter every "best tradeoff" selection runs. The
    * naive formulation is the O(n²) NOT-EXISTS self-join (that's the
    * oracle); the engine shape is the two-phase skyline: a local
    * sort-scan per partition (survivors of a partition are a superset
    * of the global skyline's members there), then the same scan over
    * the (tiny) union of local skylines. mapPartitions is the
    * documented last-resort tier (SURVEY.md §2 preference (d)) — the
    * per-partition scan is genuinely imperative. The skyline is a pure
    * function of the SET, so the result is partitioning-invariant
    * (spec-pinned); sums are exact decimals so the doubles compared
    * here are engine-portable.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("c"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)))
        .cast(DoubleType).as("total"), count(lit(1)).as("n"))
      .as[CustPoint]
      // minimize n by maximizing -n: the scan kernel is written for
      // (↑, ↑) dominance, so negate in and negate back out
      .map(p => p.copy(n = -p.n))
    val local = pts.mapPartitions(localSkyline)
    val global = local.repartition(1).mapPartitions(localSkyline)
    global.map(p => p.copy(n = -p.n)).toDF("c", "total", "n")
      .select(col("c").as("o_custkey"), col("total").as("total_spent"),
        col("n").as("n_orders"))
      .orderBy(desc("total_spent"), asc("o_custkey"))
  }

  private val qSkylineSql =
    """WITH pts AS (
      |  SELECT o_custkey AS c,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1)
      |SELECT p.c AS o_custkey, p.total AS total_spent,
      |  CAST(p.n AS BIGINT) AS n_orders
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.total >= p.total AND q.n <= p.n
      |    AND (q.total > p.total OR q.n < p.n))
      |ORDER BY total_spent DESC, o_custkey ASC""".stripMargin

  // --------------------------------------------------------- seq mining

  private val SeqSupDen = 100L // support >= 1% of users

  private val SeqWinUs = 600000000L // 10-minute tumbling windows

  /** Frequent sequential 2-patterns (GSP/PrefixSpan's length-2 core,
    * Srikant & Agrawal EDBT'96) over per-user event histories, scoped
    * to [[SeqWinUs]] tumbling windows: pattern a→b is supported by a
    * user iff in SOME window an occurrence of `a` precedes an
    * occurrence of `b`, which reduces to first(a) < last(b) in
    * (ts, event_id) lexicographic order within the window — so the
    * whole corpus collapses to ONE map-side-combinable aggregate per
    * (user, window, type) before any join. The pair join runs per
    * (user, window) on ≤|types| rows a side (a bounded alphabet),
    * never on raw events, and the distinct-user rollup bounds output
    * at |types|². The support threshold is an integer cross-multiply;
    * `support` itself is one identically-written division.
    */
  def qSeqMining(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div $SeqWinUs").as("win"),
        struct(col("ts"), col("event_id")).as("occ"))
    val perType = ev.groupBy("user_id", "win", "event_type")
      .agg(min("occ").as("first_occ"), max("occ").as("last_occ"))
      .localCheckpoint() // self-joined below; materialize once
    val nUsers = perType.select("user_id").distinct().count()
    val pairs = perType.as("f")
      .join(perType.as("l"), Seq("user_id", "win"))
      .where(col("f.event_type") =!= col("l.event_type") &&
        col("f.first_occ") < col("l.last_occ"))
      .groupBy(col("f.event_type").as("antecedent"), col("l.event_type").as("consequent"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    pairs.where(col("n_users") * SeqSupDen >= nUsers)
      .select(col("antecedent"), col("consequent"), col("n_users"),
        (col("n_users").cast(DoubleType) / nUsers).as("support"))
      .orderBy(desc("n_users"), asc("antecedent"), asc("consequent"))
  }

  private val qSeqMiningSql =
    s"""WITH pt AS (
       |  SELECT user_id, divide(epoch_us(CAST(ts AS TIMESTAMP)), $SeqWinUs) AS win, event_type,
       |    min(ROW(CAST(ts AS TIMESTAMP), event_id)) AS first_occ,
       |    max(ROW(CAST(ts AS TIMESTAMP), event_id)) AS last_occ
       |  FROM events GROUP BY 1, 2, 3),
       |n AS (SELECT COUNT(DISTINCT user_id) AS nu FROM pt),
       |sup AS (
       |  SELECT f.event_type AS antecedent, l.event_type AS consequent,
       |    COUNT(DISTINCT f.user_id) AS n_users
       |  FROM pt f JOIN pt l ON f.user_id = l.user_id AND f.win = l.win
       |  WHERE f.event_type <> l.event_type AND f.first_occ < l.last_occ
       |  GROUP BY 1, 2)
       |SELECT s.antecedent, s.consequent, s.n_users,
       |  CAST(s.n_users AS DOUBLE) / n.nu AS support
       |FROM sup s CROSS JOIN n
       |WHERE s.n_users * $SeqSupDen >= n.nu
       |ORDER BY n_users DESC, antecedent ASC, consequent ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules" -> (qAssocRules(_, _)),
    "q_knn_classify" -> (qKnnClassify(_, _)),
    "q_mrr" -> (qMrr(_, _)),
    "q_knn_ivf" -> (qKnnIvf(_, _)),
    "q_seq_mining" -> (qSeqMining(_, _)),
    "q_skyline" -> (qSkyline(_, _)))

  def oracles: Map[String, String] = Map(
    "q_assoc_rules" -> qAssocRulesSql,
    "q_knn_classify" -> qKnnClassifySql,
    "q_mrr" -> qMrrSql,
    "q_knn_ivf" -> qKnnIvfSql,
    "q_seq_mining" -> qSeqMiningSql,
    "q_skyline" -> qSkylineSql)
}
