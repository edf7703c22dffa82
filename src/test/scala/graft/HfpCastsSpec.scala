package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row
import graft.functions.HfpCasts._

/** The C3×K2 quirk matrix from FIXTURES.md §2, row by row. */
class HfpCastsSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, v: String): Any = {
    val df = Seq(Option(v)).toDF("c").select(c.as("r"))
    df.collect()(0).get(0)
  }

  test("string: empty -> NULL, else identity") {
    assert(one(castString(col("c")), "") == null)
    assert(one(castString(col("c")), "abc") == "abc")
  }

  test("int: parseInt prefix; NaN/0 -> NULL (K2 netting)") {
    assert(one(castInt(col("c")), "") == null)
    assert(one(castInt(col("c")), "abc") == null) // NaN -> 0 -> NULL
    assert(one(castInt(col("c")), "0") == null) // 0 -> NULL
    assert(one(castInt(col("c")), "42px") == 42L) // JS parseInt prefix
    assert(one(castInt(col("c")), "-17") == -17L)
  }

  test("float: parseFloat prefix; NaN/0.0 -> NULL") {
    assert(one(castFloat(col("c")), "abc") == null)
    assert(one(castFloat(col("c")), "0.0") == null)
    assert(one(castFloat(col("c")), "3.5e2oops") == 350.0)
    assert(one(castFloat(col("c")), "-2.25") == -2.25)
  }

  test("boolean: JS truthiness netted to true-or-NULL") {
    assert(one(castBool(col("c")), "") == null)
    assert(one(castBool(col("c")), "false") == true) // non-empty string!
    assert(one(castBool(col("c")), "0") == true)
    assert(one(castBool(col("c")), "true") == true)
  }

  test("isodate: dual ISO / epoch-ms; garbage -> NULL") {
    val iso = one(castTimestamp(col("c")), "2021-02-09T07:12:45")
    assert(iso.toString == "2021-02-09 07:12:45.0")
    val ms = one(castTimestamp(col("c")), "1612854765123")
    assert(ms.toString.startsWith("2021-02-09"))
    assert(one(castTimestamp(col("c")), "garbage-date") == null)
    assert(one(castTimestamp(col("c")), "") == null)
  }

  test("date: truncation of the dual parse") {
    assert(one(castDate(col("c")), "2021-02-09").toString == "2021-02-09")
    assert(one(castDate(col("c")), "not-a-date") == null)
  }

  test("casts are deterministic and idempotent on typed output") {
    // applying castString twice == once (fixpoint on its own output)
    val df = Seq("", "x", "  ").toDF("c")
    val once = df.select(castString(col("c")).as("r")).collect().toSeq
    val twice = df.select(castString(castString(col("c"))).as("r")).collect().toSeq
    assert(once == twice)
  }
}
