package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Chained KV-block prefix hashes — the LINEAR replacement for the
  * per-depth full-prefix re-hash (r12's one scale-killer: hashing
  * `md5(join(tokens[1..i·B]))` at every depth i costs Σ B·i ≈ L²/2B
  * tokens per document; a single 200k-token doc would push ~9 GB of
  * string traffic through one Generate chain).
  *
  * Identity contract: block i's hash is
  * `md5(h[i−1] ‖ '|' ‖ join(tokens[(i−1)·B+1 .. i·B], ' '))` with
  * `h[0] = ""` — a radix-trie key: two prompts share block-i hashes
  * iff their whole token prefixes up to i·B match (md5-collision
  * caveat aside, exactly as before), so every distinct-count /
  * reuse-fraction readout of the KV audit is unchanged while the work
  * per document drops to one pass over its tokens. The same chain is
  * expressible on the oracle side as DuckDB's native
  * `list_reduce(list_prepend('', blocks), (h, b) -> md5(h || '|' || b))`.
  *
  * One linear pass, no per-depth prefix materialization, per-thread
  * reused MessageDigest ([[PortableMd5]]'s discipline). Top-level
  * object so generated code calls the static forwarder directly.
  */
object PrefixChain {

  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Hex = "0123456789abcdef".getBytes

  /** The chained block hashes of `t` as array<string> of lowercase-hex
    * md5 — one element per FULL block of `block` tokens (the tail
    * partial block is never cached, matching block-cache semantics).
    * Null elements are skipped with their separator, matching
    * `array_to_string(..., ' ')` on both engines (split output never
    * contains them; the contract still pins the joined form).
    */
  def hashes(t: ArrayData, block: Int): ArrayData = {
    val m = t.numElements() / block
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val md = local.get()
    val out = new Array[Any](m)
    var prev = Array.emptyByteArray
    var tok = 0
    var i = 0
    while (i < m) {
      md.reset()
      md.update(prev)
      md.update('|'.toByte)
      var j = 0
      var first = true
      while (j < block) {
        if (!t.isNullAt(tok)) {
          if (!first) md.update(' '.toByte)
          md.update(t.getUTF8String(tok).getBytes)
          first = false
        }
        tok += 1
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = Hex((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = Hex(d(k) & 0xf)
        k += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      prev = hex
      i += 1
    }
    new GenericArrayData(out)
  }
}
