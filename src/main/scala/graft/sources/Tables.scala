package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a driver-provided scale-factor directory
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Scale notes: `spark.read.parquet` gives the vectorized columnar
  * reader, automatic file-split parallelism (`maxPartitionBytes`), and
  * Catalyst filter/column pushdown — on a real cluster this is the scan
  * layer that replaces the reference's blob-list + blob-stream source
  * (reference: hfpStorage.ts:26, azureStorage.ts:28-45). Partition
  * pruning comes from directory layout (`oday=...`) when present.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events.ts` has shipped as both TIMESTAMP(NANOS) (Spark 4 reads it
    // only via nanosAsLong → INT64) and TIMESTAMP(MICROS) (read as
    // TIMESTAMP_NTZ) across driver testdata generations. Branch on the
    // type the file actually carries so either generation resolves to a
    // session-TZ TimestampType column with identical instants (session TZ
    // is pinned to UTC, so NTZ→TZ is a reinterpretation, not a shift —
    // matching DuckDB's TIMESTAMP semantics for the oracle).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every query path enters through here, so the session always has
    // the graft function registry (PortableHash resolves graft_hash64
    // by name); idempotent and cheap
    graft.functions.GraftExpressions.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      df.schema("ts").dataType match {
        // integral `div` — double division loses precision at 1e18 ns
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else df
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
