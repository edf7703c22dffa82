package graft

import org.apache.spark.sql.Row

import graft.functions.SqlCompat

/** Unit pins for the [[SqlCompat]] DuckDB-dialect pack's EDGE
  * semantics — the cases SqlParitySpec's end-to-end statements mostly
  * never touch (out-of-range indexes, empty slices, absent elements,
  * unsupported argument forms). Expected values were TRANSCRIBED from a
  * DuckDB 1.0 CLI session rather than its docs — notably
  * list_position's 0-for-absent sentinel, which newer DuckDB releases
  * change to NULL. This suite executes only the SPARK side of each
  * alias (it runs on spark.sql), so it pins that the alias keeps the
  * transcribed behavior; a sandbox DuckDB upgrade would surface in the
  * driver's correctness runs, not here (ADVICE r12).
  */
class SqlCompatSpec extends SparkSuite {

  private lazy val s = { SqlCompat.register(sc); sc }
  private def one(sql: String): Row = s.sql(sql).collect().head

  test("list_extract: out-of-range and index 0 yield NULL, negative counts from the end") {
    val r = one("""SELECT list_extract(list_value(10, 20, 30), 5) AS oob,
      list_extract(list_value(10, 20, 30), 0) AS zero,
      list_extract(list_value(10, 20, 30), -1) AS neg,
      list_extract(list_value(10, 20, 30), 2) AS mid""")
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) == 30 && r.getInt(3) == 20)
  }

  test("list_sort: direction argument maps, anything else fails loudly") {
    assert(one("SELECT list_sort(list_value(3, 1, 2), 'DESC') AS l")
      .getSeq[Int](0) == Seq(3, 2, 1))
    assert(one("SELECT list_sort(list_value(3, 1, 2), 'ASC') AS l")
      .getSeq[Int](0) == Seq(1, 2, 3))
    intercept[Exception] { s.sql("SELECT list_sort(list_value(1), 'weird')") }
  }

  test("array_slice: end-inclusive, empty for b < a, literal negative bounds fail loudly") {
    assert(one("SELECT array_slice(list_value(1, 2, 3), 2, 3) AS l")
      .getSeq[Int](0) == Seq(2, 3))
    assert(one("SELECT array_slice(list_value(1, 2, 3), 2, 1) AS l")
      .getSeq[Int](0) == Seq())
    intercept[Exception] { s.sql("SELECT array_slice(list_value(1, 2), -1, 2)") }
  }

  test("range: 1-arg is 0-based end-exclusive, 2-arg end-exclusive") {
    assert(one("SELECT range(3) AS r").getSeq[Long](0) == Seq(0L, 1L, 2L))
    assert(one("SELECT range(2, 5) AS r").getSeq[Int](0) == Seq(2, 3, 4))
  }

  test("range/generate_series: empty ranges are EMPTY lists (not Spark's descending sequence), NULL bounds stay NULL") {
    // DuckDB: range(0) = [], generate_series(3, 1) = [] — Spark's raw
    // Sequence would descend, leaking a phantom row through any
    // downstream explode+filter (ADVICE r12: the KV audit's depth-0
    // md5('') block on an all-short-docs corpus)
    val r = one("""SELECT range(0) AS a, range(5, 2) AS b,
      generate_series(3, 1) AS c, generate_series(2, 2) AS d""")
    assert(r.getSeq[Long](0) == Seq() && r.getSeq[Int](1) == Seq())
    assert(r.getSeq[Int](2) == Seq() && r.getSeq[Int](3) == Seq(2))
    val n = one("SELECT generate_series(1, CAST(NULL AS INTEGER)) AS x")
    assert(n.isNullAt(0), "NULL bound must stay NULL, as on DuckDB")
    // the explicit negative step still descends on both engines
    assert(one("SELECT generate_series(3, 1, -1) AS x").getSeq[Int](0)
      == Seq(3, 2, 1))
  }

  test("list_position: 1-based when found, the DuckDB-1.0 0 sentinel when absent") {
    val r = one("""SELECT list_position(list_value(7, 8), 8) AS found,
      list_position(list_value(7, 8), 9) AS absent""")
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L)
  }

  test("list_reduce: only the list_prepend(init, l) composition maps; bare form fails loudly") {
    assert(one("""SELECT list_reduce(
        list_prepend(CAST(100 AS BIGINT), list_value(1L, 2L, 3L)),
        (a, b) -> a + b) AS red""").getLong(0) == 106L)
    intercept[Exception] {
      s.sql("SELECT list_reduce(list_value(1, 2), (a, b) -> a + b)").collect()
    }
  }

  test("list_aggregate: 'sum' folds sequentially, other aggregates fail loudly") {
    assert(one("SELECT list_aggregate(list_value(1.5D, 2.25D), 'sum') AS x")
      .getDouble(0) == 3.75)
    intercept[Exception] {
      s.sql("SELECT list_aggregate(list_value(1.0D), 'avg')").collect()
    }
  }

  test("epoch_ms is polymorphic: timestamp -> millis and millis -> timestamp") {
    val r = one("""SELECT epoch_ms(TIMESTAMP '1970-01-01 00:00:01') AS toMs,
      CAST(epoch_ms(1000) AS STRING) AS toTs""")
    assert(r.getLong(0) == 1000L && r.getString(1) == "1970-01-01 00:00:01")
  }

  test("dialect session settings: scoped by withDialectSession, restored after") {
    // inside the scope: raw literals ('\s' stays two characters —
    // Spark's default would unescape it and silently mangle every regex
    // in a shared statement), double-quoted identifiers, unchunked
    // base64
    SqlCompat.withDialectSession(s) {
      assert(one("SELECT length('\\s') AS l").getInt(0) == 2)
      assert(s.sql("""SELECT 1 AS "a-b"""").columns.toSeq == Seq("a-b"))
      val b64 = one("SELECT base64(CAST(repeat('x', 100) AS BINARY)) AS b").getString(0)
      assert(!b64.contains("\n"), "base64 must not MIME-chunk")
    }
    // outside: stock Spark parsing is restored — register() alone must
    // never flip parser behavior under a user session (ADVICE r12)
    assert(one("SELECT length('\\s') AS l").getInt(0) == 1,
      "escapedStringLiterals leaked outside withDialectSession")
    assert(one("""SELECT "plainstring" AS x""").getString(0) == "plainstring",
      "doubleQuotedIdentifiers leaked outside withDialectSession " +
        "(stock Spark reads double quotes as a string literal)")
  }

  test("strftime: known literal directives translate, unknown ones fail loudly") {
    assert(one("SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%dT%H:%M:%S') AS f")
      .getString(0) == "2024-03-05T07:08:09")
    intercept[Exception] {
      s.sql("SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%j')")
    }
  }

  test("divide truncates toward zero like DuckDB's //") {
    val r = one("SELECT divide(-7, 2) AS a, divide(7, 2) AS b")
    assert(r.getLong(0) == -3L && r.getLong(1) == 3L)
  }
}
