package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== PHYSICAL ===")
    println(df.queryExecution.sparkPlan.treeString)
    spark.stop()
  }
}
