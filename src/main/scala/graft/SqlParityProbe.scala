package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the library): try every registered oracle
  * through spark.sql and report which run unchanged with identical
  * rows to the DataFrame formulation. Output feeds SqlParitySpec.
  */
object SqlParityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)
    graft.functions.SqlCompat.register(spark)
    import graft.functions.SqlCompat.withDialectSession
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, sql) =>
      val status =
        try {
          // oracle text parses under the DuckDB dialect settings; the
          // DataFrame twin runs under stock parsing, as in Verify
          val viaSql = withDialectSession(spark)(spark.sql(sql).collect().toSeq)
          val viaDf = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
          if (viaSql == viaDf) "PARITY"
          else {
            val firstDiff = viaSql.zip(viaDf).zipWithIndex
              .collectFirst { case ((a, b), i) if a != b =>
                s" first diff @$i:\n  sql=$a\n  df =$b" }
              .getOrElse(" (length mismatch only)")
            s"DIFFER ${viaSql.size} vs ${viaDf.size}$firstDiff"
          }
        } catch {
          case e: Exception =>
            "ERR " + Option(e.getMessage).getOrElse("?").linesIterator
              .map(_.trim).find(_.nonEmpty).getOrElse("?").take(160)
        }
      println(s"[parity] $name: $status")
    }
    spark.stop()
  }
}
