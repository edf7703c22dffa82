package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: run named queries N times in one session,
  * printing every run's wall time (Bench reports only the min, which
  * hides whether the steady state is cache-hit or re-built).
  *
  * usage: runMain graft.ProfileQuery <sfDir> <n> <q1,q2,...>
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, nStr, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // see GraftSession: cached shared relations must coalesce like
      // any other shuffle output or tiny-partition scheduling dominates
      // (env-overridable here only, for conf A/Bs)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHE", "true"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // match Bench/Verify:
      // event instants shift on a non-UTC host otherwise, changing
      // filter/window selectivity vs the runs being compared against
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to nStr.toInt).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[profile] $name: " + times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
