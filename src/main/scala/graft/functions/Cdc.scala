package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel: one linear pass per document
  * replacing the posexplode → per-position window-hash → running-sum
  * window → collect_list/sort relational plan. Token stream is split
  * exactly like Spark's `split(text, " ")` (regex, limit -1); a cut
  * falls wherever the [[PortableMd5]] 60-bit hash of the W tokens
  * ENDING at a position is ≡ 0 mod the mask modulus (positions < W
  * never cut); the cut token closes its chunk. Each chunk is reported
  * as (md5-hex of its space-joined tokens, token count) — the same
  * values the SQL oracle computes.
  */
object Cdc {

  def chunks(s: UTF8String, w: Int, modulus: Long): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0 // 0-based index of the current chunk's first token
    var p = 1
    while (p <= n) {
      val cut = p >= w && {
        val sb = new java.lang.StringBuilder
        var i = p - w
        while (i < p) {
          if (i > p - w) sb.append(' ')
          sb.append(toks(i))
          i += 1
        }
        val bs = sb.toString.getBytes("UTF-8")
        PortableMd5.hash60(bs, 0, bs.length) % modulus == 0
      }
      if (cut || p == n) {
        val sb = new java.lang.StringBuilder
        var i = start
        while (i < p) {
          if (i > start) sb.append(' ')
          sb.append(toks(i))
          i += 1
        }
        out += InternalRow(
          UTF8String.fromString(PortableMd5.hexDigest(sb.toString.getBytes("UTF-8"))),
          (p - start).toLong)
        start = p
      }
      p += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
