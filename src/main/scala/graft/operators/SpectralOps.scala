package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Spectral primitives over the embedding corpus: distributed power
  * iteration for the top principal direction — the building block for
  * PCA whitening / spectral hashing of an embedding table, kept
  * engine-exact through pure-integer fixed-point arithmetic.
  */
object SpectralOps {

  private val PcaQ = 1048576L // 2^20 fixed-point scale
  private val PcaIters = 3    // fixed unrolled iterations (oracle CTEs)
  private val PcaDim = 64     // embeddings.embedding dimension

  /** sign-safe exact floor division rendered as Spark SQL text: the
    * numerator is made exactly divisible first, so DIV's truncation
    * equals true floor division for either sign (NOTES #29 fdiv).
    */
  private def fdiv(a: String, c: String): String =
    s"(($a) - ((($a) % ($c) + ($c)) % ($c))) DIV ($c)"

  /** Top principal direction of the embedding table by [[PcaIters]]
    * rounds of power iteration on the Gram matrix, without ever
    * materializing the d×d matrix: each round computes G·v as
    * Σ_rows x·(xᵀv) in two map-side-combining passes — a per-row
    * fixed-point dot against the broadcast-literal v, then a per-
    * position sum (d keys, so shuffle bytes are d rows per mapper no
    * matter the corpus size). v itself is O(d) model state: it is
    * collected to the driver between rounds ([[PcaDim]] longs — the
    * relation is never collected; same driver-state pattern as
    * MLlib's eigenvector iteration), and the final round stays fully
    * declarative via the 1-row-aggregate cross-join (the BPE-train
    * pattern) so the returned plan computes the last normalization
    * itself. All arithmetic is fixed-point integer (inputs quantized
    * at 2^20, per-round L∞ renormalization by exact floor division),
    * so Spark and the unrolled-CTE DuckDB oracle are bit-identical.
    */
  def qPcaPower(s: SparkSession, dir: String): DataFrame = {
    val xq = Tables(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast(DoubleType) * PcaQ.toDouble).cast(LongType)).as("xq"))
      // one small quantized relation feeds every round
      .cache()
    def sums(vq: Array[Long]): DataFrame = {
      val vLit = array(vq.map(lit(_)): _*)
      // fixed-point dot: products and sum stay in long (|xq|·|vq| ≤
      // 2^40, d=64 terms → ≤ 2^46), then rescale by 2^20
      val dot = aggregate(zip_with(col("xq"), vLit, (a, b) => a * b),
        lit(0L), (acc, y) => acc + y)
      xq.select(col("xq"), dot.as("dot"))
        .selectExpr("xq", s"${fdiv("dot", PcaQ.toString)} AS dots")
        .select(posexplode(col("xq")).as(Seq("pos", "x")), col("dots"))
        .groupBy("pos").agg(sum(col("x") * col("dots")).as("s"))
    }
    def renorm(sdf: DataFrame): DataFrame = {
      val m = sdf.agg(max(abs(col("s"))).as("m"))
        .selectExpr(s"${fdiv("m", PcaQ.toString)} + 1 AS ms")
      sdf.crossJoin(broadcast(m))
        .selectExpr("CAST(pos AS BIGINT) AS pos", s"${fdiv("s", "ms")} AS v_q")
    }
    var vq = Array.fill(PcaDim)(PcaQ)
    for (_ <- 1 until PcaIters) {
      // O(d) driver collect of the next iterate — model state only
      val next = renorm(sums(vq)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      vq = Array.tabulate(PcaDim)(i => next(i.toLong))
    }
    renorm(sums(vq)).orderBy("pos")
  }

  private val qPcaPowerSql: String = {
    def fd(a: String, c: String): String =
      s"(($a) - ((($a) % ($c) + ($c)) % ($c))) // ($c)"
    val q = PcaQ.toString
    // one CTE round: dot per vector against v{t-1}, rescale, per-pos
    // sums, L∞ renormalize — the unrolled mirror of the Spark loop
    def round(t: Int): String = {
      val vp = if (t == 1) "v0" else s"v${t - 1}"
      s"""d$t AS (SELECT vec_id, CAST(SUM(x * v) AS BIGINT) AS dot
         |  FROM xq JOIN $vp USING (pos) GROUP BY vec_id),
         |ds$t AS (SELECT vec_id, ${fd("dot", q)} AS dots FROM d$t),
         |s$t AS (SELECT pos, CAST(SUM(x * dots) AS BIGINT) AS s
         |  FROM xq JOIN ds$t USING (vec_id) GROUP BY pos),
         |m$t AS (SELECT ${fd("MAX(ABS(s))", q)} + 1 AS ms FROM s$t),
         |v$t AS (SELECT pos, ${fd("s", "ms")} AS v FROM s$t, m$t)""".stripMargin
    }
    s"""WITH xq AS (
       |  SELECT vec_id, i - 1 AS pos,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * $q) AS BIGINT) AS x
       |  FROM (SELECT vec_id, embedding,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |v0 AS (SELECT pos, CAST($q AS BIGINT) AS v
       |       FROM range(0, $PcaDim) t(pos)),
       |${(1 to PcaIters).map(round).mkString(",\n")}
       |SELECT CAST(pos AS BIGINT) AS pos, v AS v_q FROM v$PcaIters
       |ORDER BY pos""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca_power" -> (qPcaPower(_, _)))

  def oracles: Map[String, String] = Map(
    "q_pca_power" -> qPcaPowerSql)
}
