package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Record linkage (entity resolution) — the blocking + fuzzy-match +
  * best-assignment pass a data platform runs to reconcile a dirty
  * external registry against its master table. Reference scope: the
  * reference engine (an ETL loader) has no such operator; this extends
  * the curation surface the way the dedup family does, but across two
  * heterogeneous record sets rather than within one corpus.
  *
  * Scale design: the quadratic candidate space is never materialized —
  * candidates are generated per BLOCK (here the nation key; a 100 TB
  * deployment composes finer keys: name-length bucket × prefix-3 ×
  * geo), so the join shuffles both sides by block and each task scores
  * one block's cross product. Blocks are bounded by construction
  * (customers-per-nation); degenerate hot blocks would be guarded by
  * the same df-cap pattern the LSH family uses (DedupOps.ShingleDfCap).
  * Scoring is Spark's codegen'd `levenshtein`; the best-match pick is
  * two map-side-combinable aggregates (min distance, then min key at
  * that distance) — no windows, no driver state.
  */
object LinkageOps {

  private val LevThreshold = 2

  /** The synthetic "dirty registry": a deterministic perturbation of
    * the customer master keyed on the portable hash, computed
    * identically in the oracle. ~1/7 of names get an unmatchable
    * prefix mangle ('Customer#' → 'Cst#', edit distance 5), ~2/7 a
    * single character deletion (edit distance 1), the rest pass
    * through clean — so the resolver sees all three outcomes.
    */
  private def dirtyNames(df: DataFrame): DataFrame = {
    val keyStr = col("c_custkey").cast(StringType)
    val cls = PortableHash.hash64(keyStr, 11) % 7
    val len = length(col("c_name"))
    val pos = PortableHash.hash64(keyStr, 13) % greatest(len - 1, lit(1)) + 1
    val deleted = concat(
      col("c_name").substr(lit(1), (pos - 1).cast(IntegerType)),
      col("c_name").substr((pos + 1).cast(IntegerType), len))
    val mangled = concat(lit("Cst#"), col("c_name").substr(lit(10), len))
    df.select(col("c_custkey").as("dirty_id"), col("c_nationkey"),
      when(cls === 0, mangled).when(cls <= 2, deleted)
        .otherwise(col("c_name")).as("dirty_name"))
  }

  /** Resolve the dirty registry against the customer master: block on
    * nation, score candidates with edit distance ≤ [[LevThreshold]],
    * assign each dirty record its lowest-distance (ties: lowest-key)
    * master, and grade the assignment against the known identity.
    */
  def qEntityResolve(s: SparkSession, dir: String): DataFrame = {
    val master = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
    // explicit scoring parallelism (NOTES #27's rule): the dirty side
    // is byte-small (it inherits the source's 1-2 file splits) but the
    // per-block cross product is the query's CPU core — spread it over
    // every core before the broadcast join instead of scoring 9M pairs
    // in two tasks (47 s -> ~1.5 s at sf0.1)
    val dirty = dirtyNames(Tables(s, dir, "customer"))
      .repartition(math.max(s.sparkContext.defaultParallelism,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt))
    // |len(a) - len(b)| is a levenshtein lower bound: the guard drops
    // the unmatchable prefix-mangled names (length gap 5) before any
    // DP runs; the 3-arg levenshtein then runs the BANDED O(n·k)
    // computation with early exit (-1 past the threshold) instead of
    // the full O(n²) matrix — same distances for every kept pair
    val cand = dirty.join(master, Seq("c_nationkey"))
      .where(abs(length(col("dirty_name")) - length(col("c_name"))) <= LevThreshold)
      .withColumn("lev",
        levenshtein(col("dirty_name"), col("c_name"), LevThreshold).cast(LongType))
      .where(col("lev") >= 0 && col("lev") <= LevThreshold)
      .select("dirty_id", "c_custkey", "lev")
    val best = cand.groupBy("dirty_id").agg(min("lev").as("edit_dist"))
      .withColumnRenamed("dirty_id", "best_id")
    val pick = cand.join(best,
        col("dirty_id") === col("best_id") && col("lev") === col("edit_dist"))
      .groupBy("dirty_id", "edit_dist").agg(min("c_custkey").as("matched_key"))
    dirty.join(pick, Seq("dirty_id"), "left_outer")
      .select(col("dirty_id"), col("dirty_name"), col("matched_key"),
        col("edit_dist"),
        coalesce(col("matched_key") === col("dirty_id"), lit(false)).as("correct"))
      .orderBy("dirty_id")
  }

  private val qEntityResolveSql = {
    val cls = s"${PortableHash.sql("CAST(c_custkey AS VARCHAR)", 11)} % 7"
    val pos = s"${PortableHash.sql("CAST(c_custkey AS VARCHAR)", 13)}" +
      " % greatest(length(c_name) - 1, 1) + 1"
    s"""WITH dirty AS (
       |  SELECT c_custkey AS dirty_id, c_nationkey,
       |    CASE WHEN $cls = 0 THEN 'Cst#' || substr(c_name, 10)
       |         WHEN $cls <= 2 THEN substr(c_name, 1, CAST($pos AS INTEGER) - 1)
       |                             || substr(c_name, CAST($pos AS INTEGER) + 1)
       |         ELSE c_name END AS dirty_name
       |  FROM customer),
       |cand AS (
       |  SELECT d.dirty_id, m.c_custkey,
       |    CAST(levenshtein(d.dirty_name, m.c_name) AS BIGINT) AS lev
       |  FROM dirty d JOIN customer m ON m.c_nationkey = d.c_nationkey
       |  WHERE levenshtein(d.dirty_name, m.c_name) <= $LevThreshold),
       |best AS (SELECT dirty_id, min(lev) AS edit_dist FROM cand GROUP BY dirty_id),
       |pick AS (
       |  SELECT c.dirty_id, b.edit_dist, min(c.c_custkey) AS matched_key
       |  FROM cand c JOIN best b ON b.dirty_id = c.dirty_id AND c.lev = b.edit_dist
       |  GROUP BY c.dirty_id, b.edit_dist)
       |SELECT d.dirty_id, d.dirty_name, p.matched_key, p.edit_dist,
       |  coalesce(p.matched_key = d.dirty_id, false) AS correct
       |FROM dirty d LEFT JOIN pick p ON p.dirty_id = d.dirty_id
       |ORDER BY d.dirty_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entity_resolve" -> (qEntityResolve(_, _)))

  def oracles: Map[String, String] = Map(
    "q_entity_resolve" -> qEntityResolveSql)
}
