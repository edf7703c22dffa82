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
    // The driver's `events` table stores TIMESTAMP(NANOS), which Spark 4
    // rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as Long and
    // rebuild a microsecond TimestampType column — the same truncation
    // DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP, so oracle
    // comparisons stay exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every query path enters through here, so the session always has
    // the graft function registry (PortableHash resolves graft_hash64
    // by name); idempotent and cheap
    graft.functions.GraftExpressions.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // integral `div` — a double division would lose precision at 1e18 ns
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
