package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Streaming frequent-itemset SUPPORT counting — the live twin of
  * `q_assoc_rules`' A-priori support stage: order lines arrive as a
  * file stream, each resolves its brand through the static part
  * dimension and its event time through the static order header
  * (stream-static joins — no state), then per-window item supports
  * accumulate under a watermark.
  *
  * This is the stage of association mining that actually has to run on
  * the live path at scale: support counts are additive and map-side
  * combinable, so the stream maintains them incrementally per window,
  * while the quadratic pair-join + confidence/lift scoring stays a
  * batch job over the (tiny) frequent-item summary — the same
  * batch/stream split the LSH ingest probe makes (candidates live,
  * verify at rest). State is bounded: one row per (window, item),
  * expired by the watermark.
  */
object MiningStream {

  val lineSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** File-source stream over a directory of lineitem parquet. */
  def readLines(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(lineSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /** Per-(30-day window, brand) distinct-basket support counts. The
    * per-order `distinct` of the batch pipeline (an order counts one
    * support per brand no matter how many lines) is approximated
    * stream-side by `dropDuplicatesWithinWatermark` on (order, item) —
    * exact whenever an order's lines land inside the watermark horizon,
    * which is the archival-replay and the live-traffic case.
    */
  def windowedSupport(spark: SparkSession, lines: DataFrame, dir: String,
      watermark: String = "30 days"): DataFrame = {
    val parts = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand").as("item"))
    // o_orderdate ships TIMESTAMP_NTZ; the watermark clock needs a
    // session-TZ TimestampType — with the session pinned to UTC the
    // cast is a pure reinterpretation (the Tables events adapter's
    // argument)
    val orderTs = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate").cast(TimestampType).as("ots"))
    lines.select(col("l_orderkey"), col("l_partkey"))
      .join(orderTs, "l_orderkey") // stream-static: no state
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("oid"), col("item"), col("ots"))
      .withWatermark("ots", watermark)
      .dropDuplicatesWithinWatermark("oid", "item")
      .groupBy(window(col("ots"), "30 days"), col("item"))
      .agg(count(lit(1)).as("support"))
      .select(col("window.start").as("w_start"), col("item"), col("support"))
  }
}
