package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{HfpCsvSource, JdbcSink}

/** The reference's whole day-load orchestration (hfpTask.ts:13-151) as
  * one idempotent batch job: per event group — scan the group+date CSV
  * prefix, cast, key-filter, route, anti-join against the sink's
  * existing keys for that operating day, append.
  *
  * Faithful behaviors (SURVEY.md §3):
  *  - groups processed in the fixed order StopEvent, OtherEvent,
  *    VehiclePosition (hfpTask.ts:83-86)
  *  - VehiclePosition rows with `journey_type != 'journey'` route to
  *    `unsignedevent` (insertHfpFromBlobStream.ts:62-70)
  *  - the VP dedup build side is the UNION of vehicleposition and
  *    unsignedevent keys (hfpTask.ts:100-103)
  *  - dedup keys are read BEFORE the group's write starts (read
  *    isolation, hfpTask.ts:97-111)
  *  - re-running a day inserts nothing new (idempotency,
  *    hfpStorage.ts:15-16) — at-least-once within a run, healed by
  *    re-run dedup; no transactions, same as the reference
  *
  * Scale: each group is scan → narrow ops → one broadcast/shuffled
  * anti-join → partitioned append; the sink layout (`oday=` partitions)
  * makes the next run's key scan partition-pruned.
  */
object HfpLoadJob {

  /** X2 — CLI date validation (reference index.ts:9-21): the job takes
    * one operating-day argument, which must be a real `YYYY-MM-DD`
    * calendar date; anything else aborts before any Spark work. Returns
    * the normalized ISO date or a Left(reason).
    */
  def validateDate(arg: String): Either[String, String] =
    if (!arg.matches("\\d{4}-\\d{2}-\\d{2}"))
      Left(s"invalid date '$arg': expected YYYY-MM-DD")
    else
      try Right(java.time.LocalDate.parse(arg).toString)
      catch { case e: java.time.format.DateTimeParseException =>
        Left(s"invalid date '$arg': ${e.getMessage}") }

  /** CLI entry: `HfpLoadJob <csvRoot> <sinkDir> <date>` — validates the
    * date (X2), then runs [[loadDay]] and prints per-table row counts.
    */
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: HfpLoadJob <csvRoot> <sinkDir> <YYYY-MM-DD>")
      sys.exit(2)
    }
    validateDate(args(2)) match {
      case Left(reason) =>
        System.err.println(reason)
        sys.exit(2)
      case Right(date) =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        try loadDay(spark, args(0), args(1), date)
          .foreach { case (t, n) => println(s"$t: $n") }
        finally spark.stop()
    }
  }

  /** Fixed group order and group→table map (utils/hfp.ts:54-58). */
  val groups: Seq[(String, String)] = Seq(
    "StopEvent" -> "stopevent",
    "OtherEvent" -> "otherevent",
    "VehiclePosition" -> "vehicleposition")

  private def existingKeys(spark: SparkSession, sinkDir: String,
      table: String, date: String): DataFrame = {
    val path = s"$sinkDir/$table"
    if (new java.io.File(path).exists())
      spark.read.parquet(path)
        .where(col("oday") === lit(date)) // partition-pruned
        .select("uuid")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("uuid",
            org.apache.spark.sql.types.StringType))))
  }

  /** Load one day from `csvRoot/csv/<group>/<date>*` into
    * `sinkDir/<table>/oday=...` parquet. Returns rows appended per
    * table.
    */
  def loadDay(spark: SparkSession, csvRoot: String, sinkDir: String,
      date: String): Map[String, Long] = {
    val results = scala.collection.mutable.LinkedHashMap[String, Long]()
    groups.foreach { case (group, table) =>
      val path = s"$csvRoot/csv/$group"
      if (new java.io.File(path).exists()) {
        val typed0 = HfpCsvSource.castAll(HfpCsvSource.read(spark, s"$path/$date*"))
          .where(col("uuid").isNotNull && col("uuid") =!= "") // C4
        // the VP group feeds TWO routes — persist so the CSV scan+cast
        // runs once for both, not once per route
        val typed =
          if (group == "VehiclePosition") typed0.persist() else typed0
        // C5 routing: only the VP group splits
        val routes: Seq[(String, DataFrame)] =
          if (group == "VehiclePosition")
            Seq(
              "vehicleposition" -> typed.where(col("journey_type") === "journey"),
              "unsignedevent" -> typed.where(
                col("journey_type").isNull || col("journey_type") =!= "journey"))
          else Seq(table -> typed)
        // A1 build side, read BEFORE writes start; VP unions both tables
        val buildSide =
          if (group == "VehiclePosition")
            existingKeys(spark, sinkDir, "vehicleposition", date)
              .union(existingKeys(spark, sinkDir, "unsignedevent", date))
          else existingKeys(spark, sinkDir, table, date)
        try routes.foreach { case (targetTable, df) =>
          // persist so the count materializes the route ONCE and the
          // write replays the cached rows — without the pin the two
          // actions would each re-run the scan+cast+anti-join
          val fresh = df.join(buildSide, Seq("uuid"), "left_anti").persist()
          try {
            val n = fresh.count()
            if (n > 0) JdbcSink.writeParquet(fresh, sinkDir, targetTable)
            results(targetTable) = results.getOrElse(targetTable, 0L) + n
          } finally fresh.unpersist(blocking = false)
        } finally if (group == "VehiclePosition") typed.unpersist(blocking = false)
      }
    }
    results.toMap
  }
}
