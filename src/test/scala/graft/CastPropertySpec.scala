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

  // model of parseFloat×(||null): leading decimal/exponent literal; 0 -> null
  private def modelFloat(s: String): Option[Double] = {
    val m = """^([+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)""".r
      .findFirstMatchIn(s).map(_.group(1))
    m.map(_.toDouble).filter(_ != 0.0)
  }

  test("castFloat matches the JS parseFloat model") {
    val ss = samples(500) ++ Seq("3.5e2oops", ".5", "-.25", "1e", "1e5x", "0.0", "-0")
    val got = ss.toDF("c").select(castFloat(col("c")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == ss.map(modelFloat))
  }

  test("castString matches the empty->NULL model") {
    val ss = samples(500)
    val got = ss.toDF("c").select(castString(col("c")).as("r"))
      .collect().map(r => Option(r.getAs[String](0))).toSeq
    assert(got == ss.map(modelString))
  }
}
