package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** IVF-PQ — the composition production ANN indexes (FAISS-style) run
  * at scale: a coarse inverted-file index bounds WHICH vectors are
  * scored (probe the nProbe cells nearest the query — the partition
  * key at 100 TB), and product quantization bounds HOW MUCH is read
  * per scored vector (M codebook codes, 8 B/vector, asymmetric
  * distance against the broadcast codebook). Shortlist by ADC, then
  * exact re-rank only the survivors.
  *
  * Reuses [[Similarity]]'s cell machinery (deterministic centroids,
  * cosine cell assignment, probe selection) and [[Similarity2]]'s PQ
  * machinery (subspace split, codebook, map-side argmin code
  * assignment) — one pipeline, both bounds.
  *
  * Exact DuckDB oracle: same CTE composition; ADC sums quantized at
  * 2^30 over M=8 terms (order-independent), cosines rounded at 1e-6
  * on both sides.
  */
object Similarity3 {

  private val K = 10
  private val Shortlist = 30
  private val QueryId = 0
  private val NProbe = 2
  private val Pow2_30 = 1073741824.0

  private def dotE(a: String, b: String): Column = expr(s"graft_dot_f($a, $b)")

  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val e = Similarity.withNorm(s, emb)
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
    val q = cells.where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val probeCells = centroids.crossJoin(broadcast(q))
      .select(col("cid"), (dotE("ce", "qe") / (col("cn") * col("qn"))).as("cos_q"))
      .orderBy(desc("cos_q"), asc("cid")).limit(NProbe)
      .select("cid")
    val probed = cells
      .join(broadcast(probeCells), cells("cell") === probeCells("cid"), "left_semi")
      .where(col("vec_id") =!= QueryId)
      .select("vec_id")
    val sub = Similarity2.subVectors(emb)
    val cents = Similarity2.pqCodebook(sub)
    // encode only the probed vectors — the IVF bound feeds the PQ pass
    val codes = Similarity2.pqCodes(
      sub.join(broadcast(probed), Seq("vec_id"), "left_semi"), cents)
    val qsub = sub.where(col("vec_id") === QueryId)
      .select(col("m").as("qm"), col("sub").as("qvec"))
    val subDistSq = (a: Column, b: Column) => call_function("graft_dist_sq", a, b)
    val adc = codes.join(broadcast(qsub), col("m") === col("qm"))
      .select(col("vec_id"), subDistSq(col("qvec"), col("cvec")).as("term"))
      .groupBy("vec_id")
      .agg((sum(floor(col("term") * Pow2_30)).cast("double") / Pow2_30).as("adist"))
    val shortlist = adc
      .select(col("vec_id"), round(col("adist"), 6).as("approx_dist"))
      .orderBy(asc("approx_dist"), asc("vec_id"))
      .limit(Shortlist)
    Similarity.withNorm(s, emb)
      .join(shortlist, "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("approx_dist"),
        round(dotE("embedding", "qe") / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(K)
  }

  private def dotSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
  private def normSql(a: String) =
    s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
  private def subDistSqSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> (list_extract($a, i) - list_extract($b, i)) * (list_extract($a, i) - list_extract($b, i))), 'sum')"

  private val annIvfPqSql = {
    val subExpr = "list_transform(array_slice(embedding, m * 8 + 1, m * 8 + 8), x -> CAST(x AS DOUBLE))"
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT n.vec_id, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dotSql("n.embedding", "cent.ce")} / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1),
       |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = $QueryId),
       |probe AS (SELECT cid FROM cent, q
       |  ORDER BY ${dotSql("cent.ce", "q.qe")} / (cent.cn * q.qn) DESC, cid ASC LIMIT $NProbe),
       |probed AS (SELECT vec_id FROM assigned
       |  WHERE cell IN (SELECT cid FROM probe) AND vec_id <> $QueryId),
       |sub AS (
       |  SELECT vec_id, t.m, $subExpr AS sub
       |  FROM embeddings CROSS JOIN range(0, 8) t(m)),
       |cents AS (SELECT vec_id AS cid, m AS cm, sub AS cvec FROM sub WHERE vec_id % 50 = 0),
       |codes AS (
       |  SELECT vec_id, m, cvec FROM (
       |    SELECT sub.vec_id, sub.m, cents.cid, cents.cvec,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
       |        ORDER BY ${subDistSqSql("sub.sub", "cents.cvec")} ASC, cents.cid ASC) AS rk
       |    FROM sub JOIN cents ON sub.m = cents.cm
       |    JOIN probed p ON sub.vec_id = p.vec_id) WHERE rk = 1),
       |qsub AS (SELECT m AS qm, sub AS qvec FROM sub WHERE vec_id = $QueryId),
       |adc AS (
       |  SELECT codes.vec_id,
       |    CAST(SUM(CAST(floor(${subDistSqSql("qsub.qvec", "codes.cvec")} * $Pow2_30) AS BIGINT)) AS DOUBLE) / $Pow2_30 AS adist
       |  FROM codes JOIN qsub ON codes.m = qsub.qm GROUP BY codes.vec_id),
       |shortlist AS (
       |  SELECT vec_id, round(adist, 6) AS approx_dist FROM adc
       |  ORDER BY approx_dist ASC, vec_id ASC LIMIT $Shortlist)
       |SELECT n.vec_id, sl.approx_dist,
       |  round(${dotSql("n.embedding", "q.qe")} / (n.nrm * q.qn), 6) AS cosine
       |FROM n JOIN shortlist sl ON n.vec_id = sl.vec_id, q
       |ORDER BY cosine DESC, n.vec_id ASC LIMIT $K""".stripMargin
  }

  // ---------------------------------------------------------------------
  // MaxSim late-interaction retrieval (ColBERT-style)
  // ---------------------------------------------------------------------

  private val Pow2_30L = 1073741824.0 // 2^30 quantizer for the 8-term Σmax

  /** Multi-vector late interaction: treat each embedding as 8 token-like
    * sub-vectors (the PQ subspace split) and score each document by
    * Σ over query sub-vectors of the MAX cosine against any document
    * sub-vector — MaxSim, the retrieval operator multi-vector models
    * (ColBERT) use instead of single-vector cosine. The max runs as a
    * map-side-combining aggregate over (doc, query-sub) pairs, the
    * 8-term score sum is quantized (order-independent → engine-exact),
    * and the top-k is a TakeOrdered. At 100 TB the same IVF cell bound
    * applies per sub-vector; the all-pairs inner loop here is the
    * exact-oracle baseline.
    */
  def annMaxSim(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val dotD = (a: Column, b: Column) => call_function("graft_dot", a, b)
    val sub = Similarity2.subVectors(emb)
      .select(col("vec_id"), col("m"), col("sub"),
        sqrt(call_function("graft_norm_sq", col("sub"))).as("nrm"))
    val qsub = sub.where(col("vec_id") === QueryId)
      .select(col("m").as("qm"), col("sub").as("qs"), col("nrm").as("qn"))
    sub.where(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(qsub))
      .select(col("vec_id"), col("qm"),
        (dotD(col("sub"), col("qs")) / (col("nrm") * col("qn"))).as("cos"))
      .groupBy("vec_id", "qm").agg(max("cos").as("mc"))
      .select(col("vec_id"), floor(col("mc") * Pow2_30L).cast("long").as("mq"))
      .groupBy("vec_id")
      .agg((sum("mq").cast("double") / Pow2_30L).as("maxsim"))
      .orderBy(desc("maxsim"), asc("vec_id"))
      .limit(K)
  }

  private val annMaxSimSql = {
    val subExpr = "list_transform(array_slice(embedding, t.m * 8 + 1, t.m * 8 + 8), x -> CAST(x AS DOUBLE))"
    s"""WITH sub AS (
       |  SELECT vec_id, t.m, $subExpr AS s, ${normSql(subExpr)} AS nrm
       |  FROM embeddings CROSS JOIN range(0, 8) t(m)),
       |q AS (SELECT m AS qm, s AS qs, nrm AS qn FROM sub WHERE vec_id = $QueryId),
       |mx AS (
       |  SELECT sub.vec_id, q.qm, max(${dotSql("sub.s", "q.qs")} / (sub.nrm * q.qn)) AS mc
       |  FROM sub, q WHERE sub.vec_id <> $QueryId GROUP BY sub.vec_id, q.qm)
       |SELECT vec_id,
       |  CAST(SUM(CAST(floor(mc * $Pow2_30L) AS BIGINT)) AS DOUBLE) / $Pow2_30L AS maxsim
       |FROM mx GROUP BY vec_id
       |ORDER BY maxsim DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  // ---------------------------------------------------------------------
  // ANN recall evaluation
  // ---------------------------------------------------------------------

  /** The evaluation every ANN deployment needs: recall@K of the
    * approximate index against the exact brute-force ground truth, on
    * the same query. Composes the two existing operators and reduces
    * their top-K sets to one row (hits, recall) via a semi-join — at
    * scale this runs over a sampled query set, and the per-query shape
    * is unchanged: two bounded top-Ks and a K-row join.
    */
  def annRecallEval(s: SparkSession, dir: String): DataFrame = {
    val truth = Similarity.annBrute(s, dir).select("vec_id")
    val approx = Similarity.annIvf(s, dir).select("vec_id")
    val hits = approx.join(truth, Seq("vec_id"), "left_semi")
    hits.agg(count(lit(1)).as("hits"))
      .select(col("hits"), lit(K.toLong).as("k"),
        (col("hits").cast("double") / K).as("recall_at_k"))
  }

  private val annRecallEvalSql =
    s"""WITH truth AS (SELECT vec_id FROM (${Similarity.annBruteSql})),
       |approx AS (SELECT vec_id FROM (${Similarity.annIvfSql}))
       |SELECT COUNT(*) AS hits, CAST($K AS BIGINT) AS k,
       |  CAST(COUNT(*) AS DOUBLE) / $K AS recall_at_k
       |FROM approx WHERE vec_id IN (SELECT vec_id FROM truth)""".stripMargin

  /** NDCG@k of the IVF ranking against the brute-force ideal: binary
    * relevance (approx hit ∈ exact top-k), positions discounted at
    * 1/log2(rank+1) — the graded companion to `ann_recall_eval`
    * (recall says WHAT was found, NDCG says WHERE it ranked). Per-rank
    * discount terms are 1e-6-rounded and integer-summed (order-
    * independent, only k terms); NDCG is one exact integer division.
    * Cost: the same two top-k pipelines recall-eval runs, plus O(k)
    * arithmetic.
    */
  def annNdcg(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cosine"), asc("vec_id"))
    def discQ(rnk: Column): Column =
      floor(round(lit(1.0) / log2(rnk.cast(DoubleType) + 1.0), 6) * 1000000L + 0.5)
        .cast(LongType)
    val truth = Similarity.annBrute(s, dir).select("vec_id")
    val ranked = Similarity.annIvf(s, dir)
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .join(truth.withColumn("rel", lit(1L)), Seq("vec_id"), "left")
      .select(col("rnk"), coalesce(col("rel"), lit(0L)).as("rel"))
    val dcg = ranked.agg(sum(col("rel") * discQ(col("rnk"))).as("dcg_q"))
    val idcg = truth
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")).cast(LongType))
      .agg(sum(discQ(col("rnk"))).as("idcg_q"))
    dcg.crossJoin(idcg)
      .select(lit(K.toLong).as("k"),
        (col("dcg_q").cast(DoubleType) / 1000000.0).as("dcg"),
        (col("idcg_q").cast(DoubleType) / 1000000.0).as("idcg"),
        (col("dcg_q").cast(DoubleType) / col("idcg_q").cast(DoubleType)).as("ndcg"))
  }

  private val annNdcgSql = {
    def disc(rnk: String) =
      s"CAST(floor(round(1.0 / log2(CAST($rnk AS DOUBLE) + 1.0), 6) * 1000000 + 0.5) AS BIGINT)"
    s"""WITH truth AS (SELECT vec_id FROM (${Similarity.annBruteSql})),
       |approx AS (SELECT vec_id, cosine FROM (${Similarity.annIvfSql})),
       |ranked AS (
       |  SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rnk,
       |    CASE WHEN vec_id IN (SELECT vec_id FROM truth) THEN 1 ELSE 0 END AS rel
       |  FROM approx),
       |d AS (SELECT CAST(SUM(rel * ${disc("rnk")}) AS BIGINT) AS dcg_q FROM ranked),
       |i AS (SELECT CAST(SUM(${disc("rnk")}) AS BIGINT) AS idcg_q FROM (
       |  SELECT row_number() OVER (ORDER BY vec_id) AS rnk FROM truth))
       |SELECT CAST($K AS BIGINT) AS k,
       |  CAST(dcg_q AS DOUBLE) / 1000000.0 AS dcg,
       |  CAST(idcg_q AS DOUBLE) / 1000000.0 AS idcg,
       |  CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE) AS ndcg
       |FROM d, i""".stripMargin
  }

  // ---------------------------------------------------------------------
  // k-NN join (batch all-vectors neighbors)
  // ---------------------------------------------------------------------

  private val KnnK = 3

  /** The batch ANN shape the single-query operators don't cover: EVERY
    * vector gets its top-k neighbors (the input to embedding dedup,
    * graph building, kNN classifiers). The IVF cell bounds the pair
    * space — vectors only score against their own cell, the partition
    * key at scale — and the per-vector top-k runs on the custom
    * [[graft.plans.GroupedTopK]] exec: per-group bounded heaps, one
    * declared exchange, zero sorts over the pair set. Oracle is the
    * window formulation — two different algorithms, row-identical.
    */
  def annKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withNorm(s, Tables(s, dir, "embeddings"))
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
    val b = cells.select(col("vec_id").as("nbr"), col("embedding").as("be"),
      col("nrm").as("bn"), col("cell"))
    val pairs = cells.join(b, "cell")
      .where(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("nbr"),
        (expr("graft_dot_f(embedding, be)") / (col("nrm") * col("bn"))).as("cosine"))
    graft.plans.GroupedTopK(pairs, s, Seq(col("vec_id")), col("cosine"), col("nbr"), KnnK)
      .orderBy(asc("vec_id"), desc("cosine"), asc("nbr"))
  }

  private val annKnnJoinSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT n.vec_id, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dotSql("n.embedding", "cent.ce")} / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1),
       |pairs AS (
       |  SELECT aa.vec_id, bb.vec_id AS nbr,
       |    ${dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
       |  FROM assigned aa JOIN assigned bb ON aa.cell = bb.cell AND aa.vec_id <> bb.vec_id
       |  JOIN n na ON aa.vec_id = na.vec_id JOIN n nb ON bb.vec_id = nb.vec_id)
       |SELECT vec_id, nbr, cosine FROM (
       |  SELECT vec_id, nbr, cosine,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nbr ASC) AS rk
       |  FROM pairs) ranked
       |WHERE rk <= $KnnK
       |ORDER BY vec_id ASC, cosine DESC, nbr ASC""".stripMargin

  // --------------------------------------------------- centroid filter

  private val FilterLabel = 0
  // keeps ≈ the top decile of the synthetic corpus (cos ∈ [−0.36, 0.39])
  private val FilterThreshold = 0.18
  private val Pow2_48 = 281474976710656.0

  /** CLIP-score-style curation filter (the LAION recipe): keep only
    * vectors whose cosine against a prompt-class centroid clears a
    * threshold. The "prompt" here is the exact mean of the
    * label-[[FilterLabel]] vectors — per-dimension sums quantized at
    * 2^48 (the KMeansIvf centroid discipline) so the centroid is
    * bit-identical on both engines — and the score pass is one
    * broadcast of the single centroid row against a straight scan:
    * no shuffle at all beyond the tiny centroid aggregate, which is
    * the right shape when the scan is 100 TB and the centroid is 256
    * bytes. Cosines are left unrounded: dot, norms, and the division
    * are the same left-to-right IEEE chains on both engines.
    */
  def annCentroidFilter(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val e = Tables(s, dir, "embeddings")
    val cent = e.where(col("label") === FilterLabel)
      .select(posexplode(col("embedding")))
      .groupBy("pos")
      .agg((sum(floor(col("col").cast("double") * lit(Pow2_48))).cast("double") /
        count(lit(1)) / lit(Pow2_48)).as("v"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        x => x.getField("v")).as("ce"))
    val cn = sqrt(call_function("graft_norm_sq", col("ce")))
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"),
        (call_function("graft_dot", col("embedding"), col("ce")) /
          (sqrt(call_function("graft_norm_sq", col("embedding"))) * cn)).as("cosine"))
      .where(col("cosine") >= FilterThreshold)
      .orderBy("vec_id")
  }

  // the centroid's ordered rebuild sorts pos-PREFIXED encodings and
  // strips the prefix — the shared-dialect `list(v ORDER BY pos)`
  // (pos unique ⇒ payload never orders; double↔string round trip is
  // lossless on both engines)
  private val annCentroidFilterSql =
    s"""WITH mx AS (SELECT CAST(max(len(embedding)) AS BIGINT) AS m
       |  FROM embeddings WHERE label = $FilterLabel),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |cent AS (
       |  SELECT list_transform(list_sort(array_agg(
       |      lpad(CAST(pos AS STRING), 4, '0') || ':' || CAST(v AS STRING))),
       |    s -> CAST(substr(s, 6) AS DOUBLE)) AS ce FROM (
       |    SELECT pos,
       |      CAST(SUM(CAST(floor(v * $Pow2_48) AS BIGINT)) AS DOUBLE)
       |        / COUNT(*) / $Pow2_48 AS v
       |    FROM (SELECT CAST(i AS BIGINT) AS pos,
       |                 CAST(list_extract(embedding, CAST(i AS INTEGER)) AS DOUBLE) AS v
       |          FROM embeddings CROSS JOIN dims
       |          WHERE label = $FilterLabel AND i <= len(embedding))
       |    GROUP BY pos)),
       |scored AS (
       |  SELECT e.vec_id, e.label,
       |    ${dotSql("e.embedding", "c.ce")} /
       |      (${normSql("e.embedding")} * sqrt(list_aggregate(list_transform(c.ce, x -> x * x), 'sum'))) AS cosine
       |  FROM embeddings e CROSS JOIN cent c)
       |SELECT vec_id, label, cosine FROM scored
       |WHERE cosine >= $FilterThreshold ORDER BY vec_id""".stripMargin

  // --------------------------------------------- ann_recall_curve

  private val RcProbes = Seq(1, 2, 4)

  /** Recall-vs-nProbe tuning curve — THE readout an IVF deployment is
    * tuned with (the FAISS benchmark plot): for each probe budget,
    * recall@K of the IVF search against the brute-force truth. One
    * pass, not one search per budget: every corpus vector carries its
    * cell's PROBE RANK (the position of its cell in the query-cosine
    * ordering of centroids — a ≤max(nProbe)-row ranked list off a
    * global top-k, so the partition-less rank window sits over a
    * GlobalLimit, the gate-legal shape), and budget np's candidate set
    * is simply `cell_rank ≤ np`. Per-budget top-K runs on the native
    * [[graft.plans.GroupedTopK]] heap keyed by the budget; truth is
    * [[Similarity.annBrute]]'s ids. At 100 TB the sweep costs one
    * corpus scan + Σ|probed cells| candidate rows — the same work as
    * the largest single budget.
    */
  def annRecallCurve(s: SparkSession, dir: String): DataFrame = {
    val maxNp = RcProbes.max
    val e = Similarity.withNorm(s, Tables(s, dir, "embeddings"))
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
    val q = cells.where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val probeRank = centroids.crossJoin(broadcast(q))
      .select(col("cid"),
        (expr("graft_dot_f(ce, qe)") / (col("cn") * col("qn"))).as("cos_q"))
      .orderBy(desc("cos_q"), asc("cid")).limit(maxNp)
      .withColumn("cell_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("cos_q"), asc("cid"))))
      .select("cid", "cell_rank")
    val cand = cells.join(broadcast(probeRank), cells("cell") === probeRank("cid"))
      .where(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell_rank"),
        (expr("graft_dot_f(embedding, qe)") / (col("nrm") * col("qn"))).as("cosine"))
    val sweep = cand
      .crossJoin(broadcast(
        s.range(1).select(explode(lit(RcProbes.map(_.toLong).toArray)).as("nprobe"))))
      .where(col("cell_rank") <= col("nprobe"))
    val topPerBudget = graft.plans.GroupedTopK(sweep, s,
      Seq(col("nprobe")), col("cosine"), col("vec_id"), K)
    val truth = Similarity.annBrute(s, dir).select("vec_id")
    topPerBudget.join(broadcast(truth), Seq("vec_id"), "left_semi")
      .groupBy("nprobe")
      .agg(count(lit(1)).as("hits"))
      .select(col("nprobe"), col("hits"), lit(K.toLong).as("k"),
        (col("hits").cast(DoubleType) / K).as("recall_at_k"))
      .orderBy("nprobe")
  }

  private val annRecallCurveSql = {
    val probes = RcProbes.map(p => s"($p)").mkString(", ")
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.nrm, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dotSql("n.embedding", "cent.ce")} / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1),
       |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = $QueryId),
       |pr AS (
       |  SELECT cid, row_number() OVER (ORDER BY cos_q DESC, cid ASC) AS cell_rank
       |  FROM (
       |    SELECT cent.cid, ${dotSql("cent.ce", "q.qe")} / (cent.cn * q.qn) AS cos_q
       |    FROM cent CROSS JOIN q
       |    ORDER BY cos_q DESC, cid ASC LIMIT ${RcProbes.max})),
       |cand AS (
       |  SELECT a.vec_id, pr.cell_rank,
       |    ${dotSql("a.embedding", "q.qe")} / (a.nrm * q.qn) AS cosine
       |  FROM assigned a JOIN pr ON pr.cid = a.cell CROSS JOIN q
       |  WHERE a.vec_id <> $QueryId),
       |budgets AS (SELECT CAST(np AS BIGINT) AS nprobe FROM (VALUES $probes) b(np)),
       |topk AS (
       |  SELECT nprobe, vec_id FROM (
       |    SELECT b.nprobe, c.vec_id,
       |      row_number() OVER (PARTITION BY b.nprobe
       |        ORDER BY c.cosine DESC, c.vec_id ASC) AS rk
       |    FROM cand c JOIN budgets b ON c.cell_rank <= b.nprobe)
       |  WHERE rk <= $K),
       |truth AS (SELECT vec_id FROM (${Similarity.annBruteSql}))
       |SELECT t.nprobe, COUNT(*) AS hits, CAST($K AS BIGINT) AS k,
       |  CAST(COUNT(*) AS DOUBLE) / $K AS recall_at_k
       |FROM topk t JOIN truth u ON u.vec_id = t.vec_id
       |GROUP BY t.nprobe ORDER BY t.nprobe""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_curve" -> (annRecallCurve(_, _)),
    "ann_ivf_pq" -> (annIvfPq(_, _)),
    "ann_maxsim" -> (annMaxSim(_, _)),
    "ann_knn_join" -> (annKnnJoin(_, _)),
    "ann_recall_eval" -> (annRecallEval(_, _)),
    "ann_ndcg" -> (annNdcg(_, _)),
    "ann_centroid_filter" -> (annCentroidFilter(_, _)))

  def oracles: Map[String, String] = Map(
    "ann_recall_curve" -> annRecallCurveSql,
    "ann_ivf_pq" -> annIvfPqSql,
    "ann_maxsim" -> annMaxSimSql,
    "ann_knn_join" -> annKnnJoinSql,
    "ann_recall_eval" -> annRecallEvalSql,
    "ann_ndcg" -> annNdcgSql,
    "ann_centroid_filter" -> annCentroidFilterSql)
}
