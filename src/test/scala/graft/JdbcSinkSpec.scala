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
}
