package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second similarity wave:
  *
  *  - `dd_semantic` — SemDeDup-style semantic dedup: coarse-cluster the
  *    embeddings (same deterministic cells as the IVF index), then
  *    compare pairs ONLY within a cell and drop every vector that has a
  *    lower-id neighbor above the cosine threshold. The cell is the
  *    partition key: pairwise work is bounded per cell instead of
  *    quadratic in the corpus, which is the whole trick at 100 TB.
  *  - `ann_sq8` — scalar-quantized ANN: per-dimension global min/max →
  *    8-bit codes (memory: 64 B/vector instead of 256 B), asymmetric
  *    distance (dequantized data vs exact query) for a top-30 shortlist,
  *    exact cosine re-rank to top-10. The stats pass is one tiny
  *    aggregate; the shortlist pass reads only codes.
  *
  * Exact DuckDB oracles: dot products in groupBy-sum form are quantized
  * by the exact power-of-two trick (NOTES.md #4b) so the sums are
  * order-independent; the quantizer rounds via floor(x+0.5), identical
  * in both engines for non-negative x (engine `round()` tie modes
  * differ — NOTES.md #6).
  */
object Similarity2 {

  private val K = 10
  private val Shortlist = 30
  private val QueryId = 0
  private val CosThreshold = 0.42
  private val Pow2_48 = 281474976710656.0

  private def dotE(a: String, b: String): Column = expr(s"graft_dot_f($a, $b)")

  /** Semantic dedup: drop vec b if some same-cell vec a<b has
    * cosine(a,b) ≥ threshold; report the lowest such representative.
    */
  def ddSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withNorm(s, Tables(s, dir, "embeddings"))
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
    val a = cells.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("cell").as("a_cell"))
    val b = cells.select(col("vec_id").as("drop_id"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("cell"))
    a.join(b, col("a_cell") === col("cell") && col("a_id") < col("drop_id"))
      .where(dotE("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")) >= CosThreshold)
      .groupBy("drop_id", "cell")
      .agg(min(col("a_id")).as("rep_id"))
      .select(col("drop_id"), col("rep_id"), col("cell"))
      .orderBy("drop_id")
  }

  private def dotSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
  private def normSql(a: String) =
    s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  private val ddSemanticSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.nrm, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dotSql("n.embedding", "cent.ce")} / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1)
       |SELECT b.vec_id AS drop_id, min(a.vec_id) AS rep_id, b.cell
       |FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $CosThreshold
       |GROUP BY b.vec_id, b.cell ORDER BY drop_id""".stripMargin

  /** SQ8 ANN: quantize → ADC shortlist → exact re-rank. */
  def annSq8(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val emb = Tables(s, dir, "embeddings")
    val exd = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast(DoubleType).as("x"))
    val stats = exd.groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
    val q = Similarity.withNorm(s, emb).where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val qx = exd.where(col("vec_id") === QueryId).select(col("pos").as("qpos"), col("x").as("qv"))
    val deq = exd.join(broadcast(stats), "pos")
      .withColumn("d", when(col("mx") === col("mn"), col("mn"))
        .otherwise(col("mn") +
          floor((col("x") - col("mn")) * 255.0 / (col("mx") - col("mn")) + 0.5) *
            (col("mx") - col("mn")) / 255.0))
    val adc = deq.join(broadcast(qx), col("pos") === col("qpos"))
      .groupBy("vec_id")
      .agg((sum(floor(col("d") * col("qv") * Pow2_48)).cast(DoubleType) / Pow2_48).as("adot"),
        sqrt(sum(floor(col("d") * col("d") * Pow2_48)).cast(DoubleType) / Pow2_48).as("dnorm"))
    val approx = adc.crossJoin(broadcast(q.select("qn")))
      .where(col("vec_id") =!= QueryId)
      .select(col("vec_id"), round(col("adot") / (col("dnorm") * col("qn")), 6).as("approx_cos"))
      .orderBy(desc("approx_cos"), asc("vec_id"))
      .limit(Shortlist)
    Similarity.withNorm(s, emb)
      .join(approx, "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("approx_cos"),
        round(dotE("embedding", "qe") / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(K)
  }

  private val annSq8Sql =
    s"""WITH mx AS (SELECT CAST(max(len(embedding)) AS BIGINT) AS m FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |exd AS (
       |  SELECT vec_id, i - 1 AS pos,
       |    CAST(list_extract(embedding, CAST(i AS INTEGER)) AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN dims WHERE i <= len(embedding)),
       |stats AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM exd GROUP BY pos),
       |q AS (SELECT embedding AS qe, ${normSql("embedding")} AS qn FROM embeddings WHERE vec_id = $QueryId),
       |qx AS (SELECT pos, x AS qv FROM exd WHERE vec_id = $QueryId),
       |deq AS (
       |  SELECT e.vec_id, e.pos,
       |    CASE WHEN s.mx = s.mn THEN s.mn
       |         ELSE s.mn + floor((e.x - s.mn) * 255.0 / (s.mx - s.mn) + 0.5) * (s.mx - s.mn) / 255.0 END AS d
       |  FROM exd e JOIN stats s ON e.pos = s.pos),
       |adc AS (
       |  SELECT deq.vec_id,
       |    CAST(SUM(CAST(floor(deq.d * qx.qv * $Pow2_48) AS BIGINT)) AS DOUBLE) / $Pow2_48 AS adot,
       |    sqrt(CAST(SUM(CAST(floor(deq.d * deq.d * $Pow2_48) AS BIGINT)) AS DOUBLE) / $Pow2_48) AS dnorm
       |  FROM deq JOIN qx ON deq.pos = qx.pos GROUP BY deq.vec_id),
       |approx AS (
       |  SELECT a.vec_id, round(a.adot / (a.dnorm * q.qn), 6) AS approx_cos
       |  FROM adc a, q WHERE a.vec_id <> $QueryId
       |  ORDER BY approx_cos DESC, vec_id ASC LIMIT $Shortlist)
       |SELECT n.vec_id, ap.approx_cos,
       |  round(${dotSql("n.embedding", "q.qe")} / (${normSql("n.embedding")} * q.qn), 6) AS cosine
       |FROM embeddings n JOIN approx ap ON n.vec_id = ap.vec_id, q
       |ORDER BY cosine DESC, n.vec_id ASC LIMIT $K""".stripMargin

  // ---------------------------------------------------------------------
  // Product quantization
  // ---------------------------------------------------------------------

  private val M = 8 // subspaces
  private val SubDim = 8 // dims per subspace (8×8 = 64)
  private val Pow2_30 = 1073741824.0

  /** Codegen'd Σ(a−b)² kernel (GraftExpressions.DistSq) — identical
    * accumulation order to the HOF fold it replaced, so the oracles
    * are unchanged; the HOF version has no codegen and dominated the
    * PQ profile.
    */
  private def subDistSq(a: Column, b: Column): Column =
    call_function("graft_dist_sq", a, b)

  /** (vec_id, m, sub): the m-th SubDim-dim subvector, as doubles. */
  private[operators] def subVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), explode(sequence(lit(0), lit(M - 1))).as("m"),
        col("embedding"))
      .select(col("vec_id"), col("m"),
        transform(slice(col("embedding"), col("m") * SubDim + 1, lit(SubDim)),
          x => x.cast(DoubleType)).as("sub"))

  /** Deterministic per-subspace codebook (cid, cm, cvec). */
  private[operators] def pqCodebook(sub: DataFrame): DataFrame =
    sub.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("m").as("cm"), col("sub").as("cvec"))

  /** Nearest-codeword assignment → (vec_id, m, cvec). Argmin runs as a
    * map-side-combining min(struct(dist, cid)) aggregate — only
    * |vectors|·M tiny rows cross the exchange, vs. a window's full
    * |vectors|·M·|codebook| shuffle with the codeword array on every
    * row — then the (broadcast-sized) codebook is re-joined to recover
    * the codeword. Ties break to the lowest cid, identical to the
    * oracle's row_number ordering.
    */
  private[operators] def pqCodes(sub: DataFrame, cents: DataFrame): DataFrame = {
    val best = sub.join(broadcast(cents), col("m") === col("cm"))
      .select(col("vec_id"), col("m"), col("cid"),
        subDistSq(col("sub"), col("cvec")).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.cid").as("cid"))
    best.join(broadcast(cents.select(col("cm"), col("cid").as("ccid"), col("cvec"))),
        col("m") === col("cm") && col("cid") === col("ccid"))
      .select(col("vec_id"), col("m"), col("cvec"))
  }

  /** PQ ANN: each vector is M codes (one per 8-dim subspace, nearest of
    * the deterministic per-subspace codebook) — 8 bytes/vector, a 32×
    * compression over raw floats. Query time: asymmetric distance =
    * Σ_m ||q_m − codebook_m[code_m(v)]||², shortlist-30, exact cosine
    * re-rank. The codebook is a tiny broadcast; the ADC pass reads only
    * codes. Sum over the M per-subspace terms is quantized (2^30, M=8
    * terms — far inside exact-double range) so partial-sum order can't
    * leak in.
    */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val emb = Tables(s, dir, "embeddings")
    val sub = subVectors(emb)
    val cents = pqCodebook(sub)
    val codes = pqCodes(sub, cents)
    val qsub = sub.where(col("vec_id") === QueryId)
      .select(col("m").as("qm"), col("sub").as("qvec"))
    val adc = codes.join(broadcast(qsub), col("m") === col("qm"))
      .select(col("vec_id"), subDistSq(col("qvec"), col("cvec")).as("term"))
      .groupBy("vec_id")
      .agg((sum(floor(col("term") * Pow2_30)).cast(DoubleType) / Pow2_30).as("adist"))
    val shortlist = adc.where(col("vec_id") =!= QueryId)
      .select(col("vec_id"), round(col("adist"), 6).as("approx_dist"))
      .orderBy(asc("approx_dist"), asc("vec_id"))
      .limit(Shortlist)
    val q = Similarity.withNorm(s, emb).where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    Similarity.withNorm(s, emb)
      .join(shortlist, "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("approx_dist"),
        round(dotE("embedding", "qe") / (col("nrm") * col("qn")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(K)
  }

  private def subDistSqSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> (list_extract($a, i) - list_extract($b, i)) * (list_extract($a, i) - list_extract($b, i))), 'sum')"

  private val annPqSql = {
    val subExpr = "list_transform(array_slice(embedding, m * 8 + 1, m * 8 + 8), x -> CAST(x AS DOUBLE))"
    s"""WITH sub AS (
       |  SELECT vec_id, t.m, $subExpr AS sub
       |  FROM embeddings CROSS JOIN range(0, $M) t(m)),
       |cents AS (SELECT vec_id AS cid, m AS cm, sub AS cvec FROM sub WHERE vec_id % 50 = 0),
       |codes AS (
       |  SELECT vec_id, m, cvec FROM (
       |    SELECT sub.vec_id, sub.m, cents.cid, cents.cvec,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
       |        ORDER BY ${subDistSqSql("sub.sub", "cents.cvec")} ASC, cents.cid ASC) AS rk
       |    FROM sub JOIN cents ON sub.m = cents.cm) WHERE rk = 1),
       |qsub AS (SELECT m AS qm, sub AS qvec FROM sub WHERE vec_id = $QueryId),
       |adc AS (
       |  SELECT codes.vec_id,
       |    CAST(SUM(CAST(floor(${subDistSqSql("qsub.qvec", "codes.cvec")} * $Pow2_30) AS BIGINT)) AS DOUBLE) / $Pow2_30 AS adist
       |  FROM codes JOIN qsub ON codes.m = qsub.qm GROUP BY codes.vec_id),
       |shortlist AS (
       |  SELECT vec_id, round(adist, 6) AS approx_dist FROM adc
       |  WHERE vec_id <> $QueryId
       |  ORDER BY approx_dist ASC, vec_id ASC LIMIT $Shortlist),
       |q AS (SELECT embedding AS qe, ${normSql("embedding")} AS qn FROM embeddings WHERE vec_id = $QueryId)
       |SELECT n.vec_id, sl.approx_dist,
       |  round(${dotSql("n.embedding", "q.qe")} / (${normSql("n.embedding")} * q.qn), 6) AS cosine
       |FROM embeddings n JOIN shortlist sl ON n.vec_id = sl.vec_id, q
       |ORDER BY cosine DESC, n.vec_id ASC LIMIT $K""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_semantic" -> (ddSemantic(_, _)),
    "ann_sq8" -> (annSq8(_, _)),
    "ann_pq" -> (annPq(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_semantic" -> ddSemanticSql,
    "ann_sq8" -> annSq8Sql,
    "ann_pq" -> annPqSql)
}
