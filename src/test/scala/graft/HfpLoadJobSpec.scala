package graft

import java.nio.file.{Files, Paths}
import graft.jobs.HfpLoadJob
import graft.sources.HfpCsvSource

/** End-to-end day-load: counts, routing, and the reference's central
  * operational property — re-running a day inserts nothing.
  */
class HfpLoadJobSpec extends SparkSuite {

  private val date = "2021-02-09"

  private def row(overrides: Map[String, String]): String =
    HfpCsvSource.columns.map(c => overrides.getOrElse(c, "x")).mkString(",")

  private def writeArchive(): String = {
    val root = Files.createTempDirectory("hfparchive").toString
    def put(group: String, name: String, lines: Seq[String]): Unit = {
      val d = Paths.get(root, "csv", group)
      Files.createDirectories(d)
      Files.writeString(d.resolve(name), lines.mkString("\n") + "\n")
    }
    put("StopEvent", s"$date-0.csv", Seq(
      row(Map("uuid" -> "s1", "oday" -> date, "journey_type" -> "journey")),
      row(Map("uuid" -> "s2", "oday" -> date, "journey_type" -> "journey")),
      row(Map("uuid" -> "", "oday" -> date)))) // dropped by C4
    put("OtherEvent", s"$date-0.csv", Seq(
      row(Map("uuid" -> "o1", "oday" -> date))))
    put("VehiclePosition", s"$date-0.csv", Seq(
      row(Map("uuid" -> "v1", "oday" -> date, "journey_type" -> "journey")),
      row(Map("uuid" -> "v2", "oday" -> date, "journey_type" -> "deadrun")), // -> unsigned
      row(Map("uuid" -> "v3", "oday" -> date, "journey_type" -> "journey"))))
    root
  }

  test("loadDay routes, filters, and is idempotent on re-run") {
    val root = writeArchive()
    val sink = Files.createTempDirectory("hfpsink").toString
    val first = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(first == Map(
      "stopevent" -> 2L, "otherevent" -> 1L,
      "vehicleposition" -> 2L, "unsignedevent" -> 1L))
    // the reference's core contract: a re-run of the same day is a no-op
    val second = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(second.values.forall(_ == 0L), second.toString)
    // partial re-run with extra data: only the new row lands (late data)
    val d = Paths.get(root, "csv", "StopEvent")
    Files.writeString(d.resolve(s"$date-1.csv"),
      row(Map("uuid" -> "s3", "oday" -> date, "journey_type" -> "journey")) + "\n")
    val third = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(third("stopevent") == 1L && third.values.sum == 1L)
    // sink contents: correct uuids per table
    val vp = spark.read.parquet(s"$sink/vehicleposition")
      .select("uuid").collect().map(_.getString(0)).toSet
    assert(vp == Set("v1", "v3"))
    val un = spark.read.parquet(s"$sink/unsignedevent")
      .select("uuid").collect().map(_.getString(0)).toSet
    assert(un == Set("v2"))
  }

  test("each route is computed once: the sink write replays the cached rows") {
    // capture the executed plan of every write action during loadDay;
    // the source must be the persisted route (InMemoryTableScan), not a
    // second CSV scan+cast+anti-join
    val writePlans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (funcName == "command" || funcName.contains("save"))
          writePlans += qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    sc.listenerManager.register(listener)
    try {
      val root = writeArchive()
      val sink = Files.createTempDirectory("hfpsink3").toString
      HfpLoadJob.loadDay(sc, root, sink, date)
      // listener delivery is async — poll briefly for the write events
      val deadline = System.nanoTime() + 10e9.toLong
      while (!writePlans.exists(_.contains("InsertIntoHadoopFsRelation")) &&
        System.nanoTime() < deadline) Thread.sleep(100)
      val parquetWrites = writePlans.filter(_.contains("InsertIntoHadoopFsRelation"))
      assert(parquetWrites.nonEmpty, "expected captured sink writes")
      parquetWrites.foreach { p =>
        assert(p.contains("InMemoryTableScan"), p.take(800))
        // the InMemoryRelation node prints its (lazy) cached plan, which
        // legitimately mentions the CSV scan — only the plan ABOVE the
        // cache boundary must be free of a second source scan
        val aboveCache = p.substring(0, p.indexOf("InMemoryRelation"))
        assert(!aboveCache.contains("Scan csv"), aboveCache.take(800))
      }
    } finally sc.listenerManager.unregister(listener)
  }

  test("dedup scans are scoped per operating day (oday partition isolation)") {
    val root = Files.createTempDirectory("hfparchive2").toString
    val sink = Files.createTempDirectory("hfpsink2").toString
    val day2 = "2021-02-10"
    def put(name: String, lines: Seq[String]): Unit = {
      val d = Paths.get(root, "csv", "StopEvent")
      Files.createDirectories(d)
      Files.writeString(d.resolve(name), lines.mkString("\n") + "\n")
    }
    put(s"$date-0.csv", Seq(row(Map("uuid" -> "k1", "oday" -> date))))
    // SAME uuid on the next operating day: a different logical event in
    // the reference's model (dedup scans filter on oday, getEvents.ts:13)
    put(s"$day2-0.csv", Seq(row(Map("uuid" -> "k1", "oday" -> day2))))
    assert(HfpLoadJob.loadDay(sc, root, sink, date) == Map("stopevent" -> 1L))
    assert(HfpLoadJob.loadDay(sc, root, sink, day2) == Map("stopevent" -> 1L))
    // both days' rows present; re-running either day is still a no-op
    val rows = spark.read.parquet(s"$sink/stopevent")
      .select("uuid", "oday").collect()
    assert(rows.length == 2)
    assert(HfpLoadJob.loadDay(sc, root, sink, date) == Map("stopevent" -> 0L))
  }

  test("X2: CLI date validation accepts real dates, rejects malformed ones") {
    assert(HfpLoadJob.validateDate("2024-01-15") == Right("2024-01-15"))
    assert(HfpLoadJob.validateDate("2024-02-29") == Right("2024-02-29")) // leap
    assert(HfpLoadJob.validateDate("2023-02-29").isLeft) // not a leap year
    assert(HfpLoadJob.validateDate("2024-13-01").isLeft)
    assert(HfpLoadJob.validateDate("2024-00-10").isLeft)
    assert(HfpLoadJob.validateDate("15-01-2024").isLeft)
    assert(HfpLoadJob.validateDate("2024-1-5").isLeft)
    assert(HfpLoadJob.validateDate("").isLeft)
    assert(HfpLoadJob.validateDate("not-a-date").isLeft)
  }
}
