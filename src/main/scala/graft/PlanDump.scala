package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the library): print a query's optimized and
  * physical plans, optionally after materializing other queries first
  * (replicates the shared-session cache state plan gates run under).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("PLANDUMP_WARM").foreach(_.split(",").foreach { w =>
      SparkEntry.queries(w)(spark, args(1)).collect()
    })
    val df = SparkEntry.queries(args(0))(spark, args(1))
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== PHYSICAL ===")
    println(df.queryExecution.sparkPlan.treeString)
    // PLANDUMP_EXEC=1: run the query and print the AQE-final plan —
    // the only place stage/exchange REUSE is visible (sparkPlan shows
    // repeated subtrees that a single run de-duplicates)
    if (sys.env.contains("PLANDUMP_EXEC")) {
      df.collect()
      println("=== EXECUTED (AQE final) ===")
      println(df.queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
