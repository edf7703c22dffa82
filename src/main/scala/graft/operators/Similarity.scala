package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  *  - Brute force: broadcast the query vector(s), one narrow pass over
  *    every embedding computing a codegen'd fold dot product, then
  *    TakeOrderedAndProject top-k. This is the exact baseline and —
  *    because the scan is embarrassingly parallel — is itself viable
  *    at surprising scale when k is small.
  *  - IVF: coarse-quantize vectors to their nearest centroid cell
  *    (build side: one pass + a tiny broadcast of centroids); at query
  *    time probe only the nProbe nearest cells. The cell assignment is
  *    the partition key at 100 TB — each query touches a bounded
  *    fraction of the data. Centroid selection here is a deterministic
  *    sample (vec_id % 50 == 0) rather than trained k-means; the
  *    assignment/probe machinery is identical and the trainer is
  *    pluggable.
  *
  * Both variants share DedupOps.dot/norm (sequential double fold →
  * exact DuckDB oracle).
  */
object Similarity {

  private val K = 10
  private val QueryId = 0
  private val NProbe = 2

  /** Cosine kernels run on the custom codegen'd expressions
    * (GraftExpressions.DotProductF / L2NormSqF) — identical
    * accumulation order to the HOF fold they replaced, so the DuckDB
    * oracles are unchanged; the hot loop is a plain generated `for`
    * over the unsafe float array.
    */
  private[graft] def withNorm(s: SparkSession, df: DataFrame): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    df.select(col("vec_id"), col("embedding"),
      sqrt(expr("graft_norm_sq_f(embedding)")).as("nrm"))
  }

  private def dotE(a: String, b: String): Column = expr(s"graft_dot_f($a, $b)")

  /** Brute-force exact cosine top-k for query vector `QueryId`. */
  def annBrute(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, Tables(s, dir, "embeddings"))
    val q = e.where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    e.where(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dotE("embedding", "qe") / (col("nrm") * col("qn"))).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(K)
  }

  private def dotSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
  private def normSql(a: String) =
    s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  private[operators] val annBruteSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = $QueryId)
       |SELECT n.vec_id, ${dotSql("n.embedding", "q.qe")} / (n.nrm * q.qn) AS cosine
       |FROM n, q WHERE n.vec_id <> $QueryId
       |ORDER BY cosine DESC, vec_id ASC LIMIT $K""".stripMargin

  /** IVF cell assignment: nearest centroid by cosine (ties → lowest
    * centroid id). Returns vec_id, embedding, nrm, cell.
    *
    * Argmax runs as a map-side-combining min(struct(−cos, cid))
    * aggregate — double negation is exact, so "min of −cos, ties to
    * lowest cid" is the oracle's `row_number ... ORDER BY cos DESC,
    * cid ASC` verbatim, without shuffling the |vectors|·|centroids|
    * cross product through a window sort (the vector/norm columns ride
    * the grouped row instead).
    */
  private[graft] def assignCells(e: DataFrame, centroids: DataFrame): DataFrame = {
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
        (dotE("embedding", "ce") / (col("nrm") * col("cn"))).as("cos_c"))
      .groupBy("vec_id")
      // embedding/nrm are constant within the group and ride along in
      // the struct payload (cid is unique, so comparison never reaches
      // them) — cheaper than array-typed grouping keys or a re-join
      .agg(min(struct(negate(col("cos_c")).as("nc"), col("cid").as("cid"),
        col("embedding").as("embedding"), col("nrm").as("nrm"))).as("b"))
      .select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.nrm").as("nrm"), col("b.cid").as("cell"))
      // ann_ivf, ann_ivf_pq and dd_semantic build this identical plan —
      // one cache entry serves all three (size: one row per vector)
      .cache()
  }

  /** IVF probe: search only the NProbe cells nearest the query. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, Tables(s, dir, "embeddings"))
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = assignCells(e, centroids)
    val q = cells.where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val probeCells = centroids.crossJoin(broadcast(q))
      .select(col("cid"), (dotE("ce", "qe") / (col("cn") * col("qn"))).as("cos_q"))
      .orderBy(desc("cos_q"), asc("cid")).limit(NProbe)
      .select("cid")
    cells.join(broadcast(probeCells), cells("cell") === probeCells("cid"), "left_semi")
      .where(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        (dotE("embedding", "qe") / (col("nrm") * col("qn"))).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(K)
  }

  private[operators] val annIvfSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.nrm, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dotSql("n.embedding", "cent.ce")} / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1),
       |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = $QueryId),
       |probe AS (SELECT cid FROM cent, q
       |  ORDER BY ${dotSql("cent.ce", "q.qe")} / (cent.cn * q.qn) DESC, cid ASC LIMIT $NProbe)
       |SELECT a.vec_id, a.cell, ${dotSql("a.embedding", "q.qe")} / (a.nrm * q.qn) AS cosine
       |FROM assigned a, q
       |WHERE a.cell IN (SELECT cid FROM probe) AND a.vec_id <> $QueryId
       |ORDER BY cosine DESC, vec_id ASC LIMIT $K""".stripMargin

  private val RangeTau = 0.2

  /** Range (radius) search: EVERY vector within cosine ≥ τ of the
    * query — the retrieval mode dedup and contamination filters want
    * (top-k truncates arbitrarily; a threshold is semantic). Unlike
    * top-k there is no global sort/limit barrier: the scan + filter is
    * embarrassingly parallel and the result is proportional to the
    * true neighborhood size. At 100 TB the same IVF cell bound applies
    * (probe cells whose centroid cosine clears τ − cell radius);
    * brute here since the oracle must be exact.
    */
  def annRangeSearch(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, Tables(s, dir, "embeddings"))
    val q = e.where(col("vec_id") === QueryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    e.where(col("vec_id") =!= QueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dotE("embedding", "qe") / (col("nrm") * col("qn"))).as("cosine"))
      .where(col("cosine") >= RangeTau)
      .orderBy(desc("cosine"), asc("vec_id"))
  }

  private val annRangeSearchSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = $QueryId)
       |SELECT n.vec_id, ${dotSql("n.embedding", "q.qe")} / (n.nrm * q.qn) AS cosine
       |FROM n, q WHERE n.vec_id <> $QueryId
       |  AND ${dotSql("n.embedding", "q.qe")} / (n.nrm * q.qn) >= $RangeTau
       |ORDER BY cosine DESC, vec_id ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute" -> (annBrute(_, _)),
    "ann_ivf" -> (annIvf(_, _)),
    "ann_range_search" -> (annRangeSearch(_, _)))

  def oracles: Map[String, String] = Map(
    "ann_brute" -> annBruteSql,
    "ann_ivf" -> annIvfSql,
    "ann_range_search" -> annRangeSearchSql)
}
