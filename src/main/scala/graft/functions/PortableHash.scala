package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A 60-bit hash computable identically in Spark and DuckDB, used by
  * every sketch operator (MinHash, SimHash, fingerprints) so they can
  * be verified against an exact SQL oracle:
  *
  *   Spark : conv(substr(md5(s), 1, 15), 16, 10)::long
  *   SQL   : Σᵢ (instr('0123456789abcdef', substr(md5(s), i, 1)) - 1) · 16^(15-i)
  *
  * 15 hex digits = 60 bits → always positive, fits a Long exactly.
  * The SQL rendering folds the hex digits with plain-decimal BIGINT
  * weights because that form parses AND evaluates identically on BOTH
  * engines — DuckDB's terser `CAST('0x…' AS BIGINT)` (used through
  * round 10) is a dialect-only convenience that Spark's ANSI CAST
  * rejects, which kept every hash-partitioned oracle off the SQL-parity
  * list. At scale this is a codegen'd expression chain (md5 + conv) —
  * for a production deployment you'd swap in `xxhash64` (cheaper, same
  * distribution properties); the seam is this one function.
  */
object PortableHash {

  /** hash64(s): 60-bit positive hash of a string column. Runs on the
    * codegen'd [[GraftExpressions.Hash64Prefix]] (value-identical to
    * `conv(substr(md5(s),1,15),16,10)::long`, equality property-tested
    * in GraftExpressionsSpec) — resolved via the function registry,
    * which [[graft.sources.Tables]] populates on every session.
    */
  def hash64(c: Column): Column =
    call_function("graft_hash64", c)

  /** The built-in-only formulation (what hash64 computes, spelled in
    * portable Spark built-ins — kept as the equality-test reference).
    */
  def hash64Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash family member `seed`. */
  def hash64(c: Column, seed: Int): Column =
    hash64(concat(lit(s"$seed:"), c))

  /** SQL rendering of [[hash64]] over expression `e` — runs unchanged
    * on DuckDB (the driver's oracle) and spark.sql (the parity suite):
    * a positional digit fold with decimal 16^(15-i) weights. Max value
    * 16¹⁵−1 < 2⁶⁰, so the BIGINT sum can never overflow either engine.
    */
  def sql(e: String): String =
    (1 to 15).map { i =>
      val w = 1L << (4 * (15 - i))
      val d = s"(instr('0123456789abcdef', substr(md5($e), $i, 1)) - 1)"
      // weights under 2³¹ parse as INT on Spark, and digit · 2²⁸
      // overflows INT under ANSI — pin every term to BIGINT
      if (w == 1L) s"CAST($d AS BIGINT)" else s"$d * CAST($w AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** DuckDB SQL rendering of the seeded variant. */
  def sql(e: String, seed: Int): String =
    sql(s"'$seed:' || $e")
}
