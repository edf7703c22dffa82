package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as one linear pass per document: k-gram 60-bit hashes (same
  * [[GraftExpressions.Hash64Prefix]] chain the SQL oracle renders, mod
  * 2^30), sliding-window minima via a monotone deque, distinct selected
  * values. Top-level object so the generated code can call the static
  * forwarder directly (a nested object has none — NOTES.md round-4).
  *
  * This replaces the relational formulation (explode every gram →
  * per-doc window sort) with per-row compute: the corpus-sized
  * (doc, pos, hash) relation never exists, so the only shuffled rows
  * are the ~n/w selected fingerprints per document.
  */
object Winnow {

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val n = s.numChars()
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hs = new Array[Long](m)
    val ascii = s.numBytes() == n // chars == bytes → grams are byte ranges
    val bytes = if (ascii) s.getBytes else null
    var i = 0
    while (i < m) {
      // substringSQL is 1-based and char-counted — byte-identical to the
      // substring() the oracle hashes; the ASCII fast path hashes the
      // byte range in place (no per-gram UTF8String allocation)
      hs(i) =
        (if (ascii) PortableMd5.hash60(bytes, i, k)
         else PortableMd5.hash60(s.substringSQL(i + 1, k))) % 1073741824L
      i += 1
    }
    val sel = new java.util.LinkedHashSet[java.lang.Long]
    // monotone deque of indices; head is the current window minimum
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) sel.add(hs(dq(head)))
      j += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
