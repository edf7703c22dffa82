package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Skew-handling patterns, verified for semantic equivalence against
  * the plain (skew-vulnerable) formulation.
  *
  * Salting: a hot grouping key concentrates one reducer at 100 TB; the
  * two-phase rewrite — aggregate on (key, salt) first, then combine the
  * partials per key — bounds any single task to 1/SaltBuckets of the
  * hot key's rows. The partial aggregates here are algebraic (count,
  * decimal sum), so phase 2 is exact. AQE's skew-join splitting covers
  * the join-side equivalent at runtime; this is the groupBy-side
  * pattern you apply by hand.
  */
object ScaleOps {

  private val SaltBuckets = 8

  /** Two-phase salted aggregation over events by event_type (the
    * deliberately-low-cardinality = skew-prone key). Output is
    * identical to a direct groupBy — which is exactly what the DuckDB
    * oracle computes.
    */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast(DecimalType(12, 2))
    val phase1 = Tables(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(SaltBuckets)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec).as("psum"))
    phase1
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast(DoubleType).as("sum_value"))
      .orderBy("event_type")
  }

  private val qSaltedSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_agg" -> (qSaltedAgg(_, _)))

  def oracles: Map[String, String] = Map(
    "q_salted_agg" -> qSaltedSql)
}
