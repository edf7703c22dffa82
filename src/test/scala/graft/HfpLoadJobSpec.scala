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

  test("each route is computed once: the count rides the write as an observed metric") {
    // r16: capture EVERY executed action during loadDay. Each route must
    // be computed by exactly one action — the sink write itself, with the
    // appended-row count as an observed metric on that write. The old
    // shape (persist → count() → append replaying the cache) ran two
    // jobs per route and round-tripped every fresh row through the block
    // store; a reappearing standalone count action over the route would
    // mean the regression came back.
    val plans = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += ((funcName, qe.executedPlan.toString)) }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    sc.listenerManager.register(listener)
    try {
      val root = writeArchive()
      val sink = Files.createTempDirectory("hfpsink3").toString
      HfpLoadJob.loadDay(sc, root, sink, date)
      // listener delivery is async — poll until all four routes' writes
      // (stopevent, otherevent, vehicleposition, unsignedevent) arrive
      val deadline = System.nanoTime() + 10e9.toLong
      def writes = plans.synchronized {
        plans.map(_._2).filter(_.contains("InsertIntoHadoopFsRelation"))
      }
      while (writes.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(writes.size == 4, s"expected 4 route writes, got ${writes.size}")
      // each write computes its route in the SAME action: the anti-join
      // sits directly above the sink insert (CSV scan inline, or the
      // shared VP cast cache for the two VP routes)
      writes.foreach { p =>
        assert(p.contains("Join LeftAnti") || p.contains("BroadcastHashJoin"),
          p.take(800))
      }
      // and no standalone count action re-executed a route: every
      // captured `count` touches neither the CSV source nor the cached
      // VP cast (the only count left in loadDay is the pinned build
      // side's, which runs over a checkpointed LogicalRDD)
      val counts = plans.synchronized {
        plans.filter(_._1 == "count").map(_._2)
      }
      counts.foreach { p =>
        assert(!p.contains("Scan csv") && !p.contains("InMemoryTableScan"),
          p.take(800))
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

  test("loadDay works through explicit file:// URIs (Hadoop FS probes, not java.io.File)") {
    // on a cluster every path is a URI (hdfs://, abfss://); java.io.File
    // probes would return false for all of them and the load would
    // silently no-op. Driving loadDay through file:// URIs exercises the
    // FileSystem-API path end-to-end: glob discovery, sink existence
    // probe, partitioned append.
    val root = "file://" + writeArchive()
    val sink = "file://" + Files.createTempDirectory("hfpsinkuri").toString
    val first = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(first == Map(
      "stopevent" -> 2L, "otherevent" -> 1L,
      "vehicleposition" -> 2L, "unsignedevent" -> 1L))
    // idempotent re-run through the URI sink: existing keys are FOUND
    // (a java.io.File probe would miss them and re-insert everything)
    val second = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(second.values.forall(_ == 0L), second.toString)
  }

  test("loadDay drives a real JDBC sink end-to-end (Derby), idempotent on re-run") {
    import graft.sources.{HfpCsvSource, JdbcDaySink, JdbcSink}
    val url = "jdbc:derby:memory:graftday;create=true"
    // the reference applies postgres_schema.sql by migration before any
    // load runs — mirror that: create the four sink tables up front
    val conn = java.sql.DriverManager.getConnection(url)
    try Seq("stopevent", "otherevent", "vehicleposition", "unsignedevent")
      .foreach { t =>
        try conn.createStatement().execute(JdbcSink.createTableDdl(
          t, HfpCsvSource.columns, HfpCsvSource.castTypes))
        catch { case _: java.sql.SQLException => () } // already exists
      }
    finally conn.close()
    val root = writeArchive()
    val sink = JdbcDaySink(url, batchSize = 50, numPartitions = 2)
    val first = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(first == Map(
      "stopevent" -> 2L, "otherevent" -> 1L,
      "vehicleposition" -> 2L, "unsignedevent" -> 1L))
    // the reference's core contract holds against the real sink too:
    // re-running the day inserts zero rows (anti-join vs the JDBC key
    // scan, reference hfpStorage.ts:15-16)
    val second = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(second.values.forall(_ == 0L), second.toString)
    // sink contents round-trip: correct uuids per table, typed oday
    val vp = spark.read.jdbc(url, "vehicleposition", new java.util.Properties())
    assert(vp.select("uuid").collect().map(_.getString(0)).toSet == Set("v1", "v3"))
    assert(vp.select("oday").distinct().collect()
      .map(_.getDate(0).toString).toSeq == Seq(date))
    // late data: only the new row lands
    val d = Paths.get(root, "csv", "StopEvent")
    Files.writeString(d.resolve(s"$date-9.csv"),
      row(Map("uuid" -> "s9", "oday" -> date, "journey_type" -> "journey")) + "\n")
    val third = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(third("stopevent") == 1L && third.values.sum == 1L)
    assert(spark.read.jdbc(url, "stopevent", new java.util.Properties())
      .count() == 3L)
  }

  test("bootstrapDdl: loadDay against a ZERO-table database creates its tables from the generator") {
    import graft.sources.JdbcDaySink
    // the reference pre-applies its migration; the opt-in bootstrap is
    // the engine-side analog — a user pointing at an empty database
    // gets the dialect mapping's tables created on first touch
    // (Derby-safe types here; the Postgres dialect emits the
    // migration's own types, unit-tested in JdbcSinkSpec)
    val url = "jdbc:derby:memory:graftboot;create=true"
    val root = writeArchive()
    val sink = JdbcDaySink(url, batchSize = 50, numPartitions = 2,
      bootstrapDdl = true)
    val first = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(first == Map(
      "stopevent" -> 2L, "otherevent" -> 1L,
      "vehicleposition" -> 2L, "unsignedevent" -> 1L))
    // idempotent re-run through the bootstrapped tables
    val second = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(second.values.forall(_ == 0L), second.toString)
    // the created columns carry the generator's types: typed oday (DATE)
    // and comparable VARCHAR uuid (not Derby's CLOB default)
    val vp = spark.read.jdbc(url, "vehicleposition", new java.util.Properties())
    assert(vp.select("uuid").collect().map(_.getString(0)).toSet == Set("v1", "v3"))
    assert(vp.select("oday").schema.head.dataType ==
      org.apache.spark.sql.types.DateType)
    // a FRESH sink instance against the now-populated database must not
    // try to re-create (exists probe, both identifier casings)
    val again = JdbcDaySink(url, batchSize = 50, numPartitions = 2,
      bootstrapDdl = true)
    assert(HfpLoadJob.loadDay(sc, root, again, date).values.forall(_ == 0L))
    // default stays reference-faithful: no bootstrap, missing table fails
    val off = JdbcDaySink("jdbc:derby:memory:graftboot2;create=true",
      batchSize = 50, numPartitions = 2)
    intercept[Exception] { HfpLoadJob.loadDay(sc, root, off, date) }
  }

  test("VP group: same uuid in BOTH routes inserts both rows (frozen key set, JDBC sink)") {
    import graft.sources.{HfpCsvSource, JdbcDaySink, JdbcSink}
    // the reference snapshots the group's existing keys ONCE before any
    // write (hfpTask.ts:97-111), so a uuid arriving as one `journey`
    // row AND one non-journey row in the same run inserts into both
    // tables. An unpinned lazy build side would re-run the JDBC key
    // scan at route 2's action, see route 1's just-appended key, and
    // drop the second row.
    val url = "jdbc:derby:memory:graftfrozen;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try Seq("vehicleposition", "unsignedevent").foreach { t =>
      try conn.createStatement().execute(JdbcSink.createTableDdl(
        t, HfpCsvSource.columns, HfpCsvSource.castTypes))
      catch { case _: java.sql.SQLException => () }
    } finally conn.close()
    val root = Files.createTempDirectory("hfpfrozen").toString
    val d = Paths.get(root, "csv", "VehiclePosition")
    Files.createDirectories(d)
    Files.writeString(d.resolve(s"$date-0.csv"), Seq(
      row(Map("uuid" -> "dup", "oday" -> date, "journey_type" -> "journey")),
      row(Map("uuid" -> "dup", "oday" -> date, "journey_type" -> "deadrun")))
      .mkString("\n") + "\n")
    val sink = JdbcDaySink(url, batchSize = 10, numPartitions = 1)
    val first = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(first == Map("vehicleposition" -> 1L, "unsignedevent" -> 1L), first.toString)
    val p = new java.util.Properties()
    assert(spark.read.jdbc(url, "vehicleposition", p)
      .select("uuid").collect().map(_.getString(0)).toSeq == Seq("dup"))
    assert(spark.read.jdbc(url, "unsignedevent", p)
      .select("uuid").collect().map(_.getString(0)).toSeq == Seq("dup"))
    // re-run: the key now exists in both tables — nothing new
    val second = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(second.values.forall(_ == 0L), second.toString)
  }

  test("VP group: same uuid in BOTH routes inserts both rows (parquet sink)") {
    // the Derby twin of this case passed in r15 because JDBC writes
    // don't refresh cached plans — against the PARQUET sink a
    // persist+count pin is defeated by route 1's own append
    // (InsertIntoHadoopFsRelation refreshes every cached plan over the
    // written path, and the recompute re-lists the directory), so route
    // 2 dropped the row. The localCheckpoint pin leaves no file source
    // in the build side's plan for the refresh to touch.
    val root = Files.createTempDirectory("hfpdupparquet").toString
    val sink = Files.createTempDirectory("hfpdupparquetsink").toString
    val d = Paths.get(root, "csv", "VehiclePosition")
    Files.createDirectories(d)
    // seed run gives BOTH tables a real oday partition, so the dup
    // run's build side is a genuine parquet scan, not the empty frame
    Files.writeString(d.resolve(s"$date-0.csv"), Seq(
      row(Map("uuid" -> "v0", "oday" -> date, "journey_type" -> "journey")),
      row(Map("uuid" -> "u0", "oday" -> date, "journey_type" -> "deadrun")))
      .mkString("\n") + "\n")
    assert(HfpLoadJob.loadDay(sc, root, sink, date) ==
      Map("vehicleposition" -> 1L, "unsignedevent" -> 1L))
    Files.writeString(d.resolve(s"$date-1.csv"), Seq(
      row(Map("uuid" -> "dup", "oday" -> date, "journey_type" -> "journey")),
      row(Map("uuid" -> "dup", "oday" -> date, "journey_type" -> "deadrun")))
      .mkString("\n") + "\n")
    val second = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(second == Map("vehicleposition" -> 1L, "unsignedevent" -> 1L),
      second.toString)
    assert(spark.read.parquet(s"$sink/vehicleposition")
      .select("uuid").collect().map(_.getString(0)).toSet == Set("v0", "dup"))
    assert(spark.read.parquet(s"$sink/unsignedevent")
      .select("uuid").collect().map(_.getString(0)).toSet == Set("u0", "dup"))
    // re-run: both tables hold the key now — nothing new
    val third = HfpLoadJob.loadDay(sc, root, sink, date)
    assert(third.values.forall(_ == 0L), third.toString)
  }

  test("loadDay works when the archive and sink paths contain glob metacharacters") {
    // a base path with [ or { is literal directory naming, not pattern
    // syntax — the probe and the readers must agree on that (the old
    // java.io.File probe treated it literally; unescaped globStatus
    // throws or matches the wrong dirs)
    val base = Files.createTempDirectory("hfpglob")
    val root = base.resolve("arch[1]").toString
    val sink = base.resolve("sink{a}").toString
    def put(group: String, lines: Seq[String]): Unit = {
      val d = Paths.get(root, "csv", group)
      Files.createDirectories(d)
      Files.writeString(d.resolve(s"$date-0.csv"), lines.mkString("\n") + "\n")
    }
    put("StopEvent", Seq(row(Map("uuid" -> "g1", "oday" -> date))))
    assert(HfpLoadJob.loadDay(sc, root, sink, date) == Map("stopevent" -> 1L))
    // idempotent re-run: the sink probe + key scan also go through the
    // escaped path
    assert(HfpLoadJob.loadDay(sc, root, sink, date) == Map("stopevent" -> 0L))
  }

  test("opt-in LightPriorityEvent route loads the 57-column TLP wire format") {
    import graft.sources.{HfpCsvSource, ParquetDaySink}
    val root = writeArchive()
    // a TLP day file: 44 base columns + 13 tlp_* fields
    def tlpRow(overrides: Map[String, String]): String =
      HfpCsvSource.lightPriorityEventColumns
        .map(c => overrides.getOrElse(c, "x")).mkString(",")
    val d = Paths.get(root, "csv", "LightPriorityEvent")
    Files.createDirectories(d)
    Files.writeString(d.resolve(s"$date-0.csv"), Seq(
      tlpRow(Map("uuid" -> "t1", "oday" -> date, "tlp_prioritylevel" -> "high",
        "tlp_requestid" -> "42", "sid" -> "7")),
      tlpRow(Map("uuid" -> "t2", "oday" -> date, "tlp_requestid" -> "garbage")),
      tlpRow(Map("uuid" -> "", "oday" -> date))) // dropped by C4
      .mkString("\n") + "\n")
    val sinkDir = Files.createTempDirectory("hfpsinktlp").toString
    // default stays reference-faithful: the dead-DDL route is OFF
    val off = HfpLoadJob.loadDay(sc, root, ParquetDaySink(sinkDir), date)
    assert(!off.contains("lightpriorityevent"), off.toString)
    val on = HfpLoadJob.loadDay(sc, root, ParquetDaySink(sinkDir), date,
      includeLightPriority = true)
    assert(on("lightpriorityevent") == 2L)
    val tlp = spark.read.parquet(s"$sinkDir/lightpriorityevent")
    assert(tlp.columns.length == HfpCsvSource.lightPriorityEventColumns.length)
    val byId = tlp.collect().map(r => r.getAs[String]("uuid") -> r).toMap
    // TLP int casts apply (42 parses; 'garbage' nets to NULL)
    assert(byId("t1").getAs[Long]("tlp_requestid") == 42L)
    assert(byId("t1").getAs[Long]("sid") == 7L)
    assert(byId("t1").getAs[String]("tlp_prioritylevel") == "high")
    assert(byId("t2").isNullAt(byId("t2").fieldIndex("tlp_requestid")))
    // re-run with the route on: idempotent there too
    val again = HfpLoadJob.loadDay(sc, root, ParquetDaySink(sinkDir), date,
      includeLightPriority = true)
    assert(again.values.forall(_ == 0L), again.toString)
  }

  test("sinkFor: jdbc: URLs select the JDBC sink with secrets-resolved credentials") {
    import graft.sources.{JdbcDaySink, ParquetDaySink}
    val secrets = Files.createTempDirectory("hfpsecrets")
    Files.writeString(secrets.resolve("PGPASSWORD2"), "fromfile\n")
    val env = Map("PGUSER" -> "app", "PGPASSWORD" -> "fromenv",
      "EVENT_BATCH_SIZE" -> "250")
    HfpLoadJob.sinkFor("jdbc:postgresql://h:5432/db", env, secrets.toString) match {
      case j: JdbcDaySink =>
        assert(j.url == "jdbc:postgresql://h:5432/db")
        assert(j.user == "app")
        assert(j.password == "fromfile") // X1: versioned secrets file wins
        assert(j.batchSize == 250 && j.numPartitions == 100)
        assert(!j.bootstrapDdl) // default: tables pre-exist by migration
      case other => fail(s"expected JdbcDaySink, got $other")
    }
    // opt-in DDL bootstrap rides the same env resolution
    HfpLoadJob.sinkFor("jdbc:postgresql://h:5432/db",
      env + ("GRAFT_BOOTSTRAP_DDL" -> "true"), secrets.toString) match {
      case j: JdbcDaySink => assert(j.bootstrapDdl)
      case other => fail(s"expected JdbcDaySink, got $other")
    }
    assert(HfpLoadJob.sinkFor("/data/warehouse", env, secrets.toString) ==
      ParquetDaySink("/data/warehouse"))
  }

  test("sinkFor: credentials are trimmed — the validated value IS the used value") {
    import graft.sources.JdbcDaySink
    // a secrets file that preserves a trailing space would otherwise
    // pass the nonEmpty check yet send " app " verbatim to the JDBC
    // driver, failing auth at connect time — the late failure the
    // fail-fast check exists to avoid. The password only sheds the
    // trailing newline a secrets FILE appends: spaces can be a
    // legitimate part of a password and must survive.
    val secrets = Files.createTempDirectory("hfptrim")
    val env = Map("PGUSER" -> " app ", "PGPASSWORD" -> " p w \r\n")
    HfpLoadJob.sinkFor("jdbc:postgresql://h/db", env, secrets.toString) match {
      case j: JdbcDaySink =>
        assert(j.user == "app")
        assert(j.password == " p w ")
      case other => fail(s"expected JdbcDaySink, got $other")
    }
  }

  test("broadcast key gate derives from the session's autoBroadcastJoinThreshold") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // default budget (10 MB) over the ~224 B/key relation estimate:
      // ~46k keys — the same ceiling Spark itself applies to sources
      // that report statistics, instead of a fixed 1M-row constant
      // whose hashed relation (~160 MB) could pressure a default-sized
      // driver heap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L * 1024 * 1024).toString)
      assert(HfpLoadJob.broadcastKeyRows(sc) ==
        10L * 1024 * 1024 / HfpLoadJob.BroadcastKeyRowBytes)
      // disabling auto-broadcast disables the hint too
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(HfpLoadJob.broadcastKeyRows(sc) == 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("sinkFor: jdbc: URLs fail fast when credentials are missing") {
    // the reference's config resolution REQUIRES the secrets
    // (constants.ts:35-43); a silent "" default would fail late at
    // connect time or connect unauthenticated
    val secrets = Files.createTempDirectory("hfpnosecrets")
    val noUser = intercept[IllegalArgumentException] {
      HfpLoadJob.sinkFor("jdbc:postgresql://h/db",
        Map("PGPASSWORD" -> "pw"), secrets.toString)
    }
    assert(noUser.getMessage.contains("PGUSER"))
    val noPass = intercept[IllegalArgumentException] {
      HfpLoadJob.sinkFor("jdbc:postgresql://h/db",
        Map("PGUSER" -> "app"), secrets.toString)
    }
    assert(noPass.getMessage.contains("PGPASSWORD"))
    // blank values count as missing
    intercept[IllegalArgumentException] {
      HfpLoadJob.sinkFor("jdbc:postgresql://h/db",
        Map("PGUSER" -> " ", "PGPASSWORD" -> "pw"), secrets.toString)
    }
    // the parquet twin needs no credentials at all
    import graft.sources.ParquetDaySink
    assert(HfpLoadJob.sinkFor("/wh", Map.empty, secrets.toString) ==
      ParquetDaySink("/wh"))
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
