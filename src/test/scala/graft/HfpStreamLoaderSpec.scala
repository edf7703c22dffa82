package graft

import java.nio.file.{Files, Paths}
import graft.sources.HfpCsvSource
import graft.streaming.HfpStreamLoader

/** Continuous-loader behavior: files discovered incrementally,
  * cross-batch dedup against the sink, restart-safe appends.
  */
class HfpStreamLoaderSpec extends SparkSuite {

  private def row(overrides: Map[String, String]): String =
    HfpCsvSource.columns.map(c => overrides.getOrElse(c, "x")).mkString(",")

  test("streaming loader ingests incrementally and dedups across batches") {
    val root = Files.createTempDirectory("hfpstream").toString
    val sink = Files.createTempDirectory("hfpstreamsink").toString
    val ckpt = Files.createTempDirectory("hfpckpt").toString
    val dir = Paths.get(root, "csv", "VehiclePosition")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("a.csv"),
      Seq(
        row(Map("uuid" -> "v1", "oday" -> "2021-02-09", "journey_type" -> "journey")),
        row(Map("uuid" -> "v2", "oday" -> "2021-02-09", "journey_type" -> "deadrun")))
        .mkString("\n") + "\n")

    val q1 = HfpStreamLoader.start(sc, root, sink, "VehiclePosition", ckpt)
    q1.awaitTermination() // AvailableNow drains and stops
    val vp1 = spark.read.parquet(s"$sink/vehicleposition")
      .select("uuid").collect().map(_.getString(0)).toSet
    assert(vp1 == Set("v1"))
    assert(spark.read.parquet(s"$sink/unsignedevent")
      .select("uuid").collect().map(_.getString(0)).toSet == Set("v2"))

    // second file: one duplicate uuid, one new — only the new row lands
    Files.writeString(dir.resolve("b.csv"),
      Seq(
        row(Map("uuid" -> "v1", "oday" -> "2021-02-09", "journey_type" -> "journey")),
        row(Map("uuid" -> "v3", "oday" -> "2021-02-09", "journey_type" -> "journey")))
        .mkString("\n") + "\n")
    val q2 = HfpStreamLoader.start(sc, root, sink, "VehiclePosition", ckpt)
    q2.awaitTermination()
    val vp2 = spark.read.parquet(s"$sink/vehicleposition")
      .select("uuid").collect().map(_.getString(0)).toSet
    assert(vp2 == Set("v1", "v3"))

    // fresh checkpoint (simulated redeploy): full re-read, still no dupes
    val ckpt2 = Files.createTempDirectory("hfpckpt2").toString
    val q3 = HfpStreamLoader.start(sc, root, sink, "VehiclePosition", ckpt2)
    q3.awaitTermination()
    val vp3 = spark.read.parquet(s"$sink/vehicleposition")
      .select("uuid", "oday").collect()
    assert(vp3.map(_.getString(0)).toSet == Set("v1", "v3"))
    assert(vp3.length == 2) // no duplicate rows appended
  }

  test("per-batch dedup scans only the batch's oday partitions, not all history") {
    // the reference reads keys WHERE oday = $1 (getEvents.ts:13); an
    // unscoped scan would pay a full-history key read + anti-join every
    // micro-batch once the sink holds months of days
    val root = Files.createTempDirectory("hfpstream2").toString
    val sink = Files.createTempDirectory("hfpstreamsink2").toString
    val dir = Paths.get(root, "csv", "StopEvent")
    Files.createDirectories(dir)
    val day1 = "2021-02-09"; val day2 = "2021-02-10"
    Files.writeString(dir.resolve("d1.csv"),
      row(Map("uuid" -> "a1", "oday" -> day1, "journey_type" -> "journey")) + "\n")
    val q1 = HfpStreamLoader.start(sc, root, sink, "StopEvent",
      Files.createTempDirectory("ck1").toString)
    q1.awaitTermination()
    Files.writeString(dir.resolve("d2.csv"),
      row(Map("uuid" -> "a2", "oday" -> day2, "journey_type" -> "journey")) + "\n")
    val q2 = HfpStreamLoader.start(sc, root, sink, "StopEvent",
      Files.createTempDirectory("ck2").toString)
    q2.awaitTermination()
    // (q2 re-read d1.csv too — fresh checkpoint — and deduped it)
    val rows = spark.read.parquet(s"$sink/stopevent").collect()
    assert(rows.length == 2, rows.mkString(";"))

    // the key scan a day-2-only batch performs: partition-pruned to
    // oday=2021-02-10 — day 1's partition is never listed in the scan
    val keys = HfpStreamLoader.existingKeys(spark, sink, "stopevent",
      Seq(java.sql.Date.valueOf(day2)))
    assert(keys.collect().map(_.getString(0)).toSeq == Seq("a2"))
    val scan = keys.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a parquet scan"))
    // structural pruning evidence: the oday predicate is a partition
    // filter (not a post-scan filter), and only one of the two day
    // partitions survives it
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "oday")),
      scan.partitionFilters.toString)
    assert(scan.metadata("Location").contains("stopevent"))
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
  }
}
