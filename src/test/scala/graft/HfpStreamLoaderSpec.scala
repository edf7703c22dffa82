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
}
