package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A 60-bit hash computable identically in Spark and DuckDB, used by
  * every sketch operator (MinHash, SimHash, fingerprints) so they can
  * be verified against an exact SQL oracle:
  *
  *   Spark : conv(substr(md5(s), 1, 15), 16, 10)::long
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *
  * 15 hex digits = 60 bits → always positive, fits a Long exactly.
  * At scale this is a codegen'd expression chain (md5 + conv) — for a
  * production deployment you'd swap in `xxhash64` (cheaper, same
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

  /** DuckDB SQL rendering of [[hash64]] over expression `e`. */
  def sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB SQL rendering of the seeded variant. */
  def sql(e: String, seed: Int): String =
    sql(s"'$seed:' || $e")
}
