package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.HfpCasts._

/** Property tests: the Catalyst cast builders agree with a direct
  * Scala model of the reference's JS semantics (SURVEY.md §5 item 3).
  * ScalaCheck generators are driven directly (fixed seed — the build
  * has no scalatest/scalacheck bridge artifact).
  */
class CastPropertySpec extends SparkSuite {
  import spark.implicits._

  // model of parseInt×(||null): leading [+-]?digits else NaN; 0 -> null
  private def modelInt(s: String): Option[Long] = {
    val m = "^([+-]?[0-9]+)".r.findFirstMatchIn(s).map(_.group(1))
    m.filter(_.replaceFirst("^[+-]", "").length <= 18)
      .map(BigInt(_)).map(_.toLong).filter(_ != 0L)
  }

  private def modelBool(s: String): Option[Boolean] =
    if (s.nonEmpty) Some(true) else None

  private def modelString(s: String): Option[String] =
    if (s.isEmpty) None else Some(s)

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.numStr, Gen.alphaNumStr, Gen.const(""), Gen.const("0"),
    Gen.const("-0"), Gen.const("false"),
    Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
    Gen.alphaNumStr.map(s => s"12$s"),
    Gen.numStr.map(s => s"-$s"))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      strGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("castInt matches the JS parseInt model on 500 generated inputs") {
    val ss = samples(500)
    val got = ss.toDF("c").select(castInt(col("c")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == ss.map(modelInt))
  }

  test("castBool matches the JS truthiness model") {
    val ss = samples(500)
    val got = ss.toDF("c").select(castBool(col("c")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(got == ss.map(modelBool))
  }

  test("castString matches the empty->NULL model") {
    val ss = samples(500)
    val got = ss.toDF("c").select(castString(col("c")).as("r"))
      .collect().map(r => Option(r.getAs[String](0))).toSeq
    assert(got == ss.map(modelString))
  }
}
