package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.{HfpCsvSource, JdbcSink}

/** The reference's loader as a continuous service: the same wire
  * schema, cast layer, key filter, and routing as the batch
  * HfpLoadJob, fed by Structured Streaming's file source (which IS the
  * incremental blob-archive scan: new CSV files are discovered per
  * micro-batch, processed exactly once per run, and tracked in the
  * checkpoint).
  *
  * Idempotency is the same anti-join-per-batch the day-job uses —
  * re-delivered or re-uploaded files dedup against the sink's existing
  * keys, so the stream can be restarted from scratch (or the batch job
  * re-run over the same days) without double inserts. This is the
  * reference's "re-run the day" late-data model (hfpStorage.ts:15-16)
  * upgraded to continuous arrival.
  */
object HfpStreamLoader {

  /** Start loading one event group's directory. Returns the query;
    * caller owns lifecycle. `sinkDir` layout matches HfpLoadJob.
    */
  def start(spark: SparkSession, csvRoot: String, sinkDir: String,
      group: String, checkpoint: String): StreamingQuery = {
    val raw = spark.readStream
      .schema(HfpCsvSource.rawSchema)
      .option("header", "false")
      .option("sep", ",")
      .option("quote", "\"")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(s"$csvRoot/csv/$group")
    val anyValue = HfpCsvSource.columns
      .map(c => col(c).isNotNull && col(c) =!= "")
      .reduce(_ || _)
    val typed = HfpCsvSource.castAll(raw.where(anyValue))
      .where(col("uuid").isNotNull && col("uuid") =!= "")

    typed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val routes: Seq[(String, DataFrame)] =
          if (group == "VehiclePosition")
            Seq(
              "vehicleposition" -> batch.where(col("journey_type") === "journey"),
              "unsignedevent" -> batch.where(
                col("journey_type").isNull || col("journey_type") =!= "journey"))
          else Seq(graft.jobs.HfpLoadJob.groups.toMap.getOrElse(group, group.toLowerCase) -> batch)
        val buildSide =
          if (group == "VehiclePosition")
            existingKeys(s, sinkDir, "vehicleposition")
              .union(existingKeys(s, sinkDir, "unsignedevent"))
          else existingKeys(s, sinkDir, routes.head._1)
        routes.foreach { case (table, df) =>
          val fresh = df.join(buildSide, Seq("uuid"), "left_anti")
          if (!fresh.isEmpty) JdbcSink.writeParquet(fresh, sinkDir, table)
        }
      }
      .start()
  }

  private def existingKeys(spark: SparkSession, sinkDir: String, table: String): DataFrame = {
    val path = s"$sinkDir/$table"
    // Hadoop FS probe, not java.io.File — the latter is always false on
    // hdfs://-style URIs, which would silently empty the dedup build
    // side (duplicates on every restart). Probe for day partitions, not
    // the bare dir: a zero-row append leaves a _SUCCESS-only dir with
    // no schema to infer.
    if (graft.sources.FsUtil.globNonEmpty(spark, s"$path/oday=*"))
      spark.read.parquet(path).select("uuid")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("uuid",
            org.apache.spark.sql.types.StringType))))
  }
}
