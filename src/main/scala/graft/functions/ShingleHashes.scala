package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** 3-token shingle hash kernel: one linear pass per document producing
  * the DISTINCT 60-bit shingle hashes — the base relation of the whole
  * MinHash/Jaccard dedup family, computed in-row so the per-occurrence
  * string relation (and its interpreted transform/slice lambda chain)
  * never exists. Semantics are exactly the relational formulation it
  * replaces: tokens = single-space split keeping empties (Spark
  * `split(text, " ")`), shingle i = `tok[i] ⧺ " " ⧺ tok[i+1] ⧺ " " ⧺
  * tok[i+2]`, distinct, hashed by the [[PortableMd5]] 60-bit prefix —
  * dedup ON THE HASH, which is also what the oracle's
  * `SELECT DISTINCT doc_id, md5-prefix(shingle)` computes. Fewer than
  * 3 tokens → empty array (the oracle's empty `range`). Top-level
  * object so generated code calls the static forwarder.
  */
object ShingleHashes {

  def hashes(s: UTF8String): ArrayData = {
    // Spark's split(text, " ") is Java split with limit -1
    val toks = s.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = toks.length - 3
    while (i <= last) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      seen.add(PortableMd5.hash60(UTF8String.fromString(sb.toString)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
