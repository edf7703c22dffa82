import org.apache.spark.sql.SparkSession
object ArProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s  ($n rows)")
    }
    val q = graft.SparkEntry.queries("q_assoc_rules")
    t("run1")(q(spark, dir).count())
    t("run2")(q(spark, dir).count())
    t("run3")(q(spark, dir).count())
    spark.stop()
  }
}
