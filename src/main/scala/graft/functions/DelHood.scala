package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-neighborhood kernel (FastSS — Bocek, Hunt & Stiller, "Fast
  * Similarity Search in Large Dictionaries", 2007; the symmetric-delete
  * scheme SymSpell popularized): the DISTINCT 64-bit hashes of every
  * variant of `s` obtainable by deleting ≤ k characters. Two strings
  * within edit distance k always share a variant (delete the aligned
  * edit columns from each side), so an equi-join on these keys is a
  * recall-exact candidate generator for thresholded edit-distance
  * matching, with key volume linear in the corpus.
  *
  * Each variant's hash is STREAMED over the surviving characters —
  * no variant string is ever materialized, so the kernel is
  * O(L · |neighborhood|) with zero per-variant allocation. A hash
  * collision only ADDs a candidate pair, which the downstream
  * levenshtein verify rejects; recall is unaffected.
  *
  * Top-level object so generated code can call the static forwarder
  * directly (a nested object has none — NOTES.md round-4).
  */
object DelHood {

  /** Two hard caps, scaling the guard with k rather than pinning one
    * input length. The neighborhood is 1 + n + n(n-1)/2 variants —
    * quadratic only at k = 2 — so an unbounded k = 2 `graft_del_hood`
    * call is a per-row allocation bomb (a 10k-char input would allocate
    * a ~50M-element long array, and past ~65k chars the Int count
    * overflows to a negative array size). But the variant COUNT alone
    * is not the cost model: each variant hash re-streams all n chars,
    * so total per-row compute is count · n — at k ≤ 1 a count-legal
    * ~500k-char input would still burn ~n² ≈ 2.5e11 char ops, ~500×
    * the accepted k = 2 worst case. Hence:
    *
    *   - MaxVariants caps allocation (bites at n = 1024 when k = 2 —
    *     the documented short-key blocking regime, ~4 MB transient);
    *   - MaxWork caps total streamed chars (count · n) at the k = 2
    *     worst case, so k ≤ 1 inputs are legal up to n ≈ 23k (k = 1)
    *     / unbounded-in-practice (k = 0), never a compute bomb.
    *
    * Over-cap inputs fail legibly: truncate or hash the key first.
    */
  private[graft] val MaxLen = 1024
  private[graft] val MaxVariants: Long =
    1L + MaxLen + MaxLen.toLong * (MaxLen - 1) / 2
  private[graft] val MaxWork: Long = MaxVariants * MaxLen

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** FNV-1a over the chars of `s`, skipping positions `skip1`/`skip2`
    * (-1 = no skip) — the hash of the deletion variant, computed
    * without building it.
    */
  private def fnv(s: String, skip1: Int, skip2: Int): Long = {
    var h = FnvOffset
    var i = 0
    val n = s.length
    while (i < n) {
      if (i != skip1 && i != skip2) h = (h ^ s.charAt(i).toLong) * FnvPrime
      i += 1
    }
    h
  }

  /** Distinct variant hashes of the ≤k-deletion neighborhood of `u`
    * (k ≤ 2): 1 + n + n(n-1)/2 raw variants, deduped via sort (runs of
    * repeated characters share deletion variants — ~172 raw → ~60 on
    * `Customer#%09d`-shaped names).
    */
  def hashes(u: UTF8String, k: Int): ArrayData = {
    require(k >= 0 && k <= 2, s"deletion neighborhood supports k <= 2, got $k")
    val s = u.toString
    val n = s.length
    val cntL = 1L + (if (k >= 1) n.toLong else 0L) +
      (if (k >= 2) n.toLong * (n - 1) / 2 else 0L)
    require(cntL <= MaxVariants,
      s"graft_del_hood: input of $n chars at k=$k yields $cntL deletion " +
        s"variants (cap $MaxVariants — at k=2 that is inputs over $MaxLen " +
        "chars); the neighborhood grows quadratically with length at k=2, " +
        "so truncate or hash long keys before blocking on them")
    require(cntL * n <= MaxWork,
      s"graft_del_hood: input of $n chars at k=$k costs $cntL variants x " +
        s"$n streamed chars = ${cntL * n} char ops (cap $MaxWork, the k=2 " +
        "worst case); each variant hash re-streams the whole input, so " +
        "truncate or hash long keys before blocking on them")
    val cnt = cntL.toInt
    val hs = new Array[Long](cnt)
    var c = 0
    hs(c) = fnv(s, -1, -1); c += 1
    if (k >= 1) {
      var j = 0
      while (j < n) { hs(c) = fnv(s, j, -1); c += 1; j += 1 }
    }
    if (k >= 2) {
      var j = 1
      while (j < n) {
        var i = 0
        while (i < j) { hs(c) = fnv(s, i, j); c += 1; i += 1 }
        j += 1
      }
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < cnt) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(hs, 0, out, 0, w)
    new GenericArrayData(out)
  }
}
