package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.EvalOps

/** Property tests for the two-phase rank kit that replaced the
  * single-partition windows: on random multisets, rnValueId must equal
  * row_number over the same total order, and ntileBin must equal
  * Spark's own ntile() — including the N % n boundary, tie pile-ups,
  * and N < n. ScalaCheck generators driven directly with a fixed seed
  * (no scalatest bridge in this build).
  */
class RankKitPropertySpec extends SparkSuite {
  import spark.implicits._

  private val caseGen: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(1, 120)
    // small key domain → heavy ties, the adversarial regime for rank kits
    keys <- Gen.listOfN(n, Gen.choose(0L, 6L))
    tiles <- Gen.choose(1, 13)
  } yield (keys, tiles)

  private def cases(count: Int): Seq[(List[Long], Int)] =
    (1 to count).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(7000L + i)).toSeq
    }

  test("rnValueId == row_number over (key, id); ntileBin == ntile, 40 random cases") {
    cases(40).zipWithIndex.foreach { case ((keys, tiles), i) =>
      val df = keys.zipWithIndex.map { case (k, id) => (k, id.toLong) }
        .toDF("k", "id")
      val nTot = df.count()
      val got = EvalOps.rnValueId(df, col("k"), keyAsc = true, col("id"), idShift = 2)
        .withColumn("bin", EvalOps.ntileBin(tiles, col("rn"), lit(nTot)))
        .select("k", "id", "rn", "bin")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val w = Window.orderBy("k", "id")
      val want = df
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("bin", ntile(tiles).over(w).cast(LongType))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == want, s"case $i (n=${keys.size}, tiles=$tiles)")
    }
  }

  test("rnValueId descending key order matches the desc window") {
    cases(10).zipWithIndex.foreach { case ((keys, _), i) =>
      val df = keys.zipWithIndex.map { case (k, id) => (k, id.toLong) }
        .toDF("k", "id")
      val got = EvalOps.rnValueId(df, col("k"), keyAsc = false, col("id"), idShift = 3)
        .select("k", "id", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(desc("k"), asc("id"))).cast(LongType))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"desc case $i")
    }
  }
}
