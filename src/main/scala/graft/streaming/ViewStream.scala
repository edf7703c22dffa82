package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming materialized-view maintenance — the live twin of
  * `q_incr_join` (ScaleOps): the fact side (orders) arrives as a file
  * stream, the dimension (customer) is static, and every micro-batch
  * emits exactly the view DELTA — the batch's rows joined to the
  * dimension. Appending the deltas to the base IS the four-term
  * delta-join identity q_incr_join verifies in batch (the static-side
  * ΔR terms are empty here; a slowly-changing dimension would re-run
  * the Lb⋈ΔR term as a batch backfill — the documented split between
  * what streams and what batches, same as DocsStream's dedup note).
  *
  * The stream-static equi-join is stateless (no watermark, no state
  * store): the dimension is broadcast into every micro-batch and the
  * per-batch cost is O(batch rows). Maintained AGGREGATES on top of
  * the view are the foreachBatch sink's job — fold each delta into the
  * stored aggregate exactly as `q_incr_agg` folds a day's partials.
  *
  * Every operator is stream-safe and deterministic, so the same
  * function runs on a batch DataFrame unchanged — the spec pins
  * stream-vs-batch equality and reconciles the streamed delta total
  * against `q_incr_join`'s full-recompute verdict.
  */
object ViewStream {

  /** Fact columns the view needs — a subset schema prunes the scan
    * (and sidesteps the nanos-timestamp column entirely).
    */
  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  /** File-source stream over a directory of orders parquet. */
  def readOrders(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(ordersSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /** The view delta for one micro-batch: arriving orders enriched with
    * their customer's segment and nation, revenue as exact
    * DECIMAL(12,2) cents (the money rule) so folding deltas into the
    * stored aggregate is associative and engine-exact.
    */
  def viewDelta(spark: SparkSession, stream: DataFrame,
      staticCustomer: DataFrame): DataFrame = {
    val dim = staticCustomer.select(
      col("c_custkey").as("o_custkey"),
      col("c_mktsegment"), col("c_nationkey"))
    stream
      .join(broadcast(dim), Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"),
        col("c_nationkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"))
  }
}
