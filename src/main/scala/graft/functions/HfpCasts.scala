package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's cast/normalize layer (C3) composed with its sink's
  * falsy→NULL coercion (K2), re-expressed as pure Catalyst expression
  * builders — no UDFs, fully codegen'd, ANSI-safe (`try_*` only, so the
  * builders work under Spark 4's default ANSI mode).
  *
  * Net observable semantics being reproduced (reference:
  * transformHfpItem.ts:54-107 × upsert.ts:36 — see SURVEY.md §1.2/§2):
  *   - string:  empty → NULL, else identity (values arrive trimmed; C1)
  *   - int:     JS `parseInt` (leading [+-]?digits, else NaN); NaN→0;
  *              then sink nets 0→NULL. So: no leading int → NULL,
  *              parsed value 0 → NULL.
  *   - float:   JS `parseFloat` (leading decimal/exponent literal);
  *              same NaN→0→NULL netting.
  *   - boolean: JS truthiness — any non-empty string (even "false",
  *              "0") → true; empty/NULL → false; sink nets false→NULL.
  *              So only `true` or NULL is ever observable.
  *   - isodate: empty → NULL; contains '-' → ISO-8601 parse; else →
  *              epoch-milliseconds integer; unparseable → NULL
  *              (transformHfpItem.ts:90-103). Kept as TimestampType in
  *              UTC (the reference reformats to a local-TZ ISO string —
  *              we pin UTC, documented divergence per SURVEY.md §7).
  *   - date:    same dual-format parse, truncated to DateType
  *              (reference formats `yyyy-MM-dd`).
  */
object HfpCasts {

  /** JS `parseInt` prefix: optional sign + digits. */
  private val IntPrefix = "^([+-]?[0-9]+)"

  /** JS `parseFloat` prefix: decimal or scientific literal. */
  private val FloatPrefix = "^([+-]?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?)"

  /** string cast: empty → NULL (transformHfpItem.ts:58-64). */
  def castString(c: Column): Column =
    when(c.isNull || c === "", lit(null).cast(StringType)).otherwise(c)

  /** int cast, K2-netted: parseInt; no-parse → NULL; 0 → NULL.
    * The regexp guarantees the matched prefix is sign+digits, so a plain
    * cast is ANSI-safe; >18 digits (would overflow Long / lose precision
    * in JS doubles anyway) → NULL.
    */
  def castInt(c: Column): Column = {
    val m = regexp_extract(c, IntPrefix, 1)
    val digits = length(regexp_replace(m, "^[+-]", ""))
    val v = when(m === "" || m.isNull || digits > 18, lit(null).cast(LongType))
      .otherwise(m.cast(LongType))
    nullif(v, lit(0L))
  }

  /** float cast, K2-netted: parseFloat; no-parse → NULL; 0.0 → NULL. */
  def castFloat(c: Column): Column = {
    val m = regexp_extract(c, FloatPrefix, 1)
    val v = when(m === "" || m.isNull, lit(null).cast(DoubleType))
      .otherwise(m.cast(DoubleType)) // matched literal is always castable
    nullif(v, lit(0.0d))
  }

  /** boolean cast, K2-netted: non-empty → true, else NULL. */
  def castBool(c: Column): Column =
    when(c.isNotNull && c =!= "", lit(true)).otherwise(lit(null).cast(BooleanType))

  /** isodate cast: dual ISO / epoch-ms parse → TimestampType (UTC).
    * Strings containing '-' take the ISO path (reference checks
    * `includes('-')`); everything else is `parseInt`ed as epoch-ms.
    * JS `Date` rejects |ms| > 8.64e15 → mirror with a ≤15-digit guard
    * (also keeps `timestamp_millis` ANSI-overflow-safe).
    */
  def castTimestamp(c: Column): Column = {
    val ms = regexp_extract(c, "^([0-9]+)", 1)
    when(c.isNull || c === "", lit(null).cast(TimestampType))
      .when(c.contains("-"), try_to_timestamp(c))
      .when(ms === "" || length(ms) > 15, lit(null).cast(TimestampType))
      .otherwise(timestamp_millis(ms.cast(LongType)))
  }

  /** date cast: same dual parse, truncated to DateType. */
  def castDate(c: Column): Column = castTimestamp(c).cast(DateType)
}
