package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcSink

/** Real JDBC round trip against embedded Derby (ships with Spark):
  * exercises the K1/K2 sink (batched concurrent append) and the S3 key
  * scan with pushdown — the full reference sink/scan surface, not just
  * its configuration.
  */
class JdbcSinkSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val cfg = JdbcSink.Config(url, "hfp_keys", batchSize = 50, numPartitions = 2)

  test("append writes batched+partitioned; key scan pushes filter and projection") {
    import spark.implicits._
    // pre-create with VARCHAR columns: Spark's Derby dialect would map
    // StringType to CLOB, which Derby can't compare against literals
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE hfp_keys (uuid VARCHAR(64), oday VARCHAR(16), value DOUBLE)")
    catch { case _: java.sql.SQLException => () } // already exists
    finally conn.close()
    val day1 = (1 to 100).map(i => (s"u$i", "2021-02-09", i.toDouble))
    val day2 = (101 to 120).map(i => (s"u$i", "2021-02-10", i.toDouble))
    val df = sc.createDataFrame(day1 ++ day2).toDF("uuid", "oday", "value")
    JdbcSink.write(df, cfg)

    val keys = JdbcSink.readKeys(spark, cfg, "2021-02-09")
    assert(keys.columns.toSeq == Seq("uuid"))
    val got = keys.collect().map(_.getString(0)).toSet
    assert(got == (1 to 100).map(i => s"u$i").toSet)

    // the filter reaches the database (JDBC pushdown, reference S3)
    val plan = keys.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("equalto(oday"),
      plan.take(1200))

    // idempotent reload: anti-join against existing keys -> nothing new
    val fresh = df.where(col("oday") === "2021-02-09")
      .join(JdbcSink.readKeys(spark, cfg, "2021-02-09"), Seq("uuid"), "left_anti")
    assert(fresh.count() == 0)

    // late data for the same day: only the new rows land
    val late = Seq(("u999", "2021-02-09", 999.0)).toDF("uuid", "oday", "value")
    JdbcSink.write(
      late.join(JdbcSink.readKeys(spark, cfg, "2021-02-09"), Seq("uuid"), "left_anti"), cfg)
    assert(JdbcSink.readKeys(spark, cfg, "2021-02-09").count() == 101)
  }

  test("pinned small key side broadcasts the anti-join through the Derby sink") {
    import spark.implicits._
    // a JDBC relation reports NO statistics, so Spark alone never
    // auto-broadcasts the key scan even when a day holds 100 keys —
    // the count taken while pinning the build side (HfpLoadJob
    // .pinnedBuildSide) is what licenses the explicit hint
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE bc_keys (uuid VARCHAR(64), oday VARCHAR(16))")
    catch { case _: java.sql.SQLException => () }
    finally conn.close()
    val bcCfg = JdbcSink.Config(url, "bc_keys", batchSize = 50, numPartitions = 1)
    JdbcSink.write(
      (1 to 5).map(i => (s"k$i", "2021-02-09")).toDF("uuid", "oday"), bcCfg)
    val (buildSide, unpin) =
      graft.jobs.HfpLoadJob.pinnedBuildSide(JdbcSink.readKeys(spark, bcCfg, "2021-02-09"))
    try {
      val incoming = Seq("k1", "k9").toDF("uuid")
      val fresh = incoming.join(buildSide, Seq("uuid"), "left_anti")
      assert(fresh.collect().map(_.getString(0)).toSeq == Seq("k9"))
      val plan = fresh.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        plan.take(1200))
    } finally unpin()
  }

  test("Postgres dialect DDL reproduces the reference migration's column types") {
    import graft.sources.HfpCsvSource
    // expected types transcribed from the reference migration
    // (postgres_schema.sql:65-112; TLP-only columns :44-56) — the
    // five event tables declare identical types per column name
    val expected = Map(
      "owner_operator_id" -> "smallint", "direction_id" -> "smallint",
      "geohash_level" -> "smallint", "dir" -> "smallint",
      "oper" -> "smallint", "hdg" -> "smallint", "line" -> "smallint",
      "occu" -> "smallint", "seq" -> "smallint", "dr_type" -> "smallint",
      "vehicle_number" -> "integer", "veh" -> "integer",
      "dl" -> "integer", "jrn" -> "integer", "stop" -> "integer",
      "tlp_requestid" -> "integer", "tlp_att_seq" -> "integer",
      "sid" -> "integer", "signal_groupid" -> "integer",
      "tlp_signalgroupnbr" -> "integer", "tlp_line_configid" -> "integer",
      "tlp_point_configid" -> "integer", "tlp_frequency" -> "integer",
      "tsi" -> "bigint", "version" -> "bigint",
      "acc" -> "double precision", "spd" -> "double precision",
      "lat" -> "double precision", "long" -> "double precision",
      "odo" -> "double precision", "topic_latitude" -> "double precision",
      "topic_longitude" -> "double precision",
      "is_ongoing" -> "boolean", "drst" -> "boolean",
      "journey_start_time" -> "time", "start" -> "time",
      "tst" -> "timestamp with time zone",
      "received_at" -> "timestamp with time zone",
      "oday" -> "date", "uuid" -> "uuid")
      .withDefault(_ => "varchar(255)")
    // the 57-column TLP list is a superset of the 44 wire columns, so
    // one sweep covers every column of every reference table
    val ddl = JdbcSink.createTableDdl("lightpriorityevent",
      HfpCsvSource.lightPriorityEventColumns,
      HfpCsvSource.lightPriorityCastTypes, JdbcSink.Postgres)
    val body = ddl.stripPrefix("CREATE TABLE lightpriorityevent (").stripSuffix(")")
    val got = body.split(", ").map { colDef =>
      val Array(name, tpe) = colDef.split(" ", 2)
      name -> tpe
    }.toMap
    assert(got.size == HfpCsvSource.lightPriorityEventColumns.size)
    HfpCsvSource.lightPriorityEventColumns.foreach { c =>
      assert(got(c) == expected(c), s"column $c: got ${got(c)}, want ${expected(c)}")
    }
    // the Derby-safe default is unchanged: BIGINT/VARCHAR from the cast table
    val derby = JdbcSink.createTableDdl("stopevent",
      HfpCsvSource.columns, HfpCsvSource.castTypes)
    assert(derby.contains("tsi BIGINT") && derby.contains("uuid VARCHAR(255)"))
  }
}
