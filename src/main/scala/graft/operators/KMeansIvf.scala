package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Distributed Lloyd's k-means over the embedding table — the trainer
  * that upgrades Similarity's IVF from sampled centroids to trained
  * cells — built so that EVERY arithmetic step is engine-portable and
  * the whole training run has an exact DuckDB oracle:
  *
  *  - cluster assignment minimizes `-2·v·c + |c|²` (the |v|² term is
  *    constant per vector and dropped), with dot products computed as
  *    sequential left-to-right folds — deterministic and identical in
  *    both engines;
  *  - centroid updates quantize coordinates by an EXACT power-of-two
  *    scale (`floor(v·2^48)` — multiplying a double by 2^48 only
  *    shifts the exponent, so it is exact in both engines; decimal
  *    casts are NOT portable for arbitrary doubles) and sum the
  *    resulting integers exactly — summation-order-independent, so the
  *    new centroids are bit-identical regardless of partitioning;
  *  - ties in assignment break to the lowest centroid id.
  *
  * Scale shape per iteration: one broadcast of the k centroid arrays,
  * one narrow assignment pass, one shuffle on (cell, dim) for the
  * update — the canonical distributed k-means. Iterations are a fixed
  * small constant (2) here; a production trainer loops to convergence
  * with the same two stages.
  */
object KMeansIvf {

  private val Iterations = 2
  private val SeedMod = 200 // centroid seeds: vec_id % 200 == 0
  private val Pow2_48 = 281474976710656.0 // exact power-of-two quantizer

  /** Codegen'd kernels (GraftExpressions.DotProduct / L2NormSq accept
    * float AND double arrays): same left-to-right double accumulation
    * as the HOF fold they replaced — bit-identical scores, oracle
    * unchanged — but the hot loop is generated code, not per-element
    * lambda dispatch over ArrayData.
    */
  private def dotFold(a: Column, b: Column): Column =
    expr(s"graft_dot(${a.toString}, ${b.toString})")

  private def normSqD(a: Column): Column =
    expr(s"graft_norm_sq(${a.toString})")

  /** Argmin-cell assignment of every vector under `cents`. The argmin
    * is `min(struct(score, cid))` — a hash aggregate (map-side partial,
    * one shuffle, no sort) instead of a row_number window, with the
    * same lowest-score-then-lowest-cid tie order the oracle uses.
    */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        col("cid"),
        (lit(-2.0) * dotFold(col("embedding"), col("ce")) + normSqD(col("ce"))).as("score"))
      .groupBy("vec_id")
      .agg(min(struct(col("score"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))

  /** One Lloyd iteration: assign to argmin cell, then exact-quantized
    * per-dimension means. `cents`: (cid: Long, ce: Array[Double]).
    */
  private def iterate(e: DataFrame, ve: DataFrame, cents: DataFrame): DataFrame = {
    val assigned = assign(e, cents)
    ve.join(assigned, "vec_id")
      .groupBy(col("cell").as("cid"), col("pos"))
      .agg((sum(floor(col("v") * lit(Pow2_48))).cast(DoubleType) /
        count(lit(1)) / lit(Pow2_48)).as("v"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("ce"))
  }

  private def trainedCentroids(e: DataFrame): DataFrame = {
    val ve = e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast(LongType).as("pos"),
        col("col").cast(DoubleType).as("v"))
    val cent0 = e.where(col("vec_id") % SeedMod === 0)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
    (1 to Iterations).foldLeft(cent0)((c, _) => iterate(e, ve, c))
  }

  /** The trained centroids after `Iterations` Lloyd steps, exploded to
    * (cid, pos, v) rows for the oracle compare.
    */
  def kmeansTrain(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val e = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val trained = trainedCentroids(e)
    // no rounding: centroid values are bit-identical across engines by
    // construction (decimal-exact sums, single double division), and
    // round() itself has engine-divergent tie behavior
    trained.select(col("cid"), posexplode(col("ce")))
      .select(col("cid"), (col("pos") + 1).cast(LongType).as("pos"),
        col("col").as("v"))
      .orderBy("cid", "pos")
  }

  /** End-to-end trained IVF probe: train → assign all vectors to the
    * trained cells → pick the 2 cells nearest the query (same score) →
    * exact cosine top-10 within the probed cells. The oracle replays
    * the full chain in SQL.
    */
  def annIvfTrained(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val e = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    // the trained-centroid subtree feeds BOTH the final assignment and
    // the probe selection — cache it (k rows) so the two-iteration
    // Lloyd pipeline executes once, not once per consumer
    val cents = trainedCentroids(e).cache()
    val cells = assign(e, cents)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val probe = cents.crossJoin(broadcast(q))
      .select(col("cid"),
        (lit(-2.0) * dotFold(col("ce"), col("qe")) + normSqD(col("ce"))).as("score"))
      .orderBy(asc("score"), asc("cid")).limit(2).select("cid")
    val qn = q.select(sqrt(normSqD(col("qe"))).as("qnrm"), col("qe"))
    e.join(cells, "vec_id")
      .join(broadcast(probe), col("cell") === col("cid"), "left_semi")
      .where(col("vec_id") =!= 0)
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), col("cell"),
        (dotFold(col("embedding"), col("qe")) /
          (sqrt(normSqD(col("embedding"))) * col("qnrm"))).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id")).limit(10)
  }

  // ---- DuckDB oracle ----------------------------------------------------

  private def dotSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * list_extract($b, i)), 'sum')"
  private def normSqSql(a: String) =
    s"list_aggregate(list_transform($a, x -> x * x), 'sum')"

  private def assignSql(cent: String, name: String): String =
    s"""$name AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        (-2.0 * ${dotSql("e.embedding", "c.ce")} + ${normSqSql("c.ce")}) ASC,
       |        c.cid ASC) AS rk
       |    FROM embeddings e CROSS JOIN $cent c) WHERE rk = 1)""".stripMargin

  // centroid assembly: the ordered list is rebuilt by sorting
  // pos-PREFIXED encodings ('0007:<v>') and stripping the prefix — the
  // shared-dialect spelling of `list(v ORDER BY pos)` (pos is unique
  // per group, so the payload never decides the order, and the
  // double→string→double round trip is lossless on both engines)
  private def iterSql(cent: String, assign: String, next: String): String =
    s"""${assignSql(cent, assign)},
       |$next AS (
       |  SELECT cid, list_transform(list_sort(array_agg(
       |      lpad(CAST(pos AS STRING), 4, '0') || ':' || CAST(v AS STRING))),
       |    s -> CAST(substr(s, 6) AS DOUBLE)) AS ce FROM (
       |    SELECT a.cell AS cid, ve.pos,
       |      CAST(SUM(CAST(floor(ve.v * 281474976710656.0) AS BIGINT)) AS DOUBLE)
       |        / COUNT(*) / 281474976710656.0 AS v
       |    FROM ve JOIN $assign a ON ve.vec_id = a.vec_id
       |    GROUP BY a.cell, ve.pos)
       |  GROUP BY cid)""".stripMargin

  private val kmeansTrainSql = {
    val iters = (1 to Iterations)
      .map(i => iterSql(s"cent${i - 1}", s"assign$i", s"cent$i"))
      .mkString(",\n")
    s"""WITH mx AS (SELECT CAST(max(len(embedding)) AS BIGINT) AS m FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |ve AS (
       |  SELECT vec_id, CAST(i AS BIGINT) AS pos,
       |    CAST(list_extract(embedding, CAST(i AS INTEGER)) AS DOUBLE) AS v
       |  FROM embeddings CROSS JOIN dims WHERE i <= len(embedding)),
       |cent0 AS (
       |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id % $SeedMod = 0),
       |$iters
       |SELECT cid, CAST(i AS BIGINT) AS pos,
       |  list_extract(ce, CAST(i AS INTEGER)) AS v
       |FROM cent$Iterations CROSS JOIN dims WHERE i <= len(ce)
       |ORDER BY cid, pos""".stripMargin
  }

  private val annIvfTrainedSql = {
    val iters = (1 to Iterations)
      .map(i => iterSql(s"cent${i - 1}", s"assign$i", s"cent$i"))
      .mkString(",\n")
    val ffDot =
      "list_aggregate(list_transform(generate_series(1, len(e.embedding)), i -> CAST(list_extract(e.embedding, i) AS DOUBLE) * CAST(list_extract(q.qe, i) AS DOUBLE)), 'sum')"
    def ffNorm(a: String) =
      s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    s"""WITH mx AS (SELECT CAST(max(len(embedding)) AS BIGINT) AS m FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |ve AS (
       |  SELECT vec_id, CAST(i AS BIGINT) AS pos,
       |    CAST(list_extract(embedding, CAST(i AS INTEGER)) AS DOUBLE) AS v
       |  FROM embeddings CROSS JOIN dims WHERE i <= len(embedding)),
       |cent0 AS (
       |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id % $SeedMod = 0),
       |$iters,
       |${assignSql(s"cent$Iterations", "assignF")},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cid FROM (
       |    SELECT c.cid, row_number() OVER (ORDER BY
       |      (-2.0 * ${dotSql("c.ce", "q.qe")} + ${normSqSql("c.ce")}) ASC, c.cid ASC) AS rk
       |    FROM cent$Iterations c, q) WHERE rk <= 2)
       |SELECT e.vec_id, a.cell, $ffDot / (${ffNorm("e.embedding")} * ${ffNorm("q.qe")}) AS cosine
       |FROM embeddings e JOIN assignF a ON a.vec_id = e.vec_id, q
       |WHERE a.cell IN (SELECT cid FROM probe) AND e.vec_id <> 0
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT 10""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_train" -> (kmeansTrain(_, _)),
    "ann_ivf_trained" -> (annIvfTrained(_, _)))

  def oracles: Map[String, String] = Map(
    "kmeans_train" -> kmeansTrainSql,
    "ann_ivf_trained" -> annIvfTrainedSql)
}
