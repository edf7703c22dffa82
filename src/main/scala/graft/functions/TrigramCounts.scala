package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Char-trigram count kernel: one linear pass per document producing
  * the DISTINCT trigrams with multiplicities — the per-doc pre-
  * aggregation the langid family needs, computed in-row so the
  * corpus-sized (doc, pos, trigram) relation never exists and the
  * only shuffled rows are distinct-trigram-sized. Trigram extraction
  * is 1-based char-counted substring(text, i, 3) for i ∈ [1, n−2] —
  * identical to the `substr` enumeration the DuckDB oracle renders
  * (empty for n < 3, matching `range`'s empty-when-end≤start).
  * Top-level object so generated code calls the static forwarder
  * (NOTES.md round-4).
  */
object TrigramCounts {

  def counts(s: UTF8String): ArrayData = {
    val n = s.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[AnyRef])
    // insertion-ordered so the array is deterministic for a given text
    // (downstream explode+aggregate is order-insensitive either way)
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    val last = n - 3
    while (i <= last) {
      val tg = s.substringSQL(i + 1, 3)
      val c = m.get(tg)
      if (c == null) m.put(tg, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[AnyRef](m.size())
    val it = m.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = InternalRow(e.getKey, e.getValue()(0))
      o += 1
    }
    new GenericArrayData(out)
  }
}
