package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftExpressions, PortableMd5, Winnow, Cdc}

/** Direct unit tests for the whole-document JVM kernels — the paths the
  * corpus never exercises: empty/short inputs, exact boundary lengths,
  * and the non-ASCII fallback (the corpus is ASCII, so the byte-range
  * fast path otherwise runs unchallenged against substringSQL).
  */
class KernelSpec extends AnyFunSuite {

  private def winnowRef(s: String, k: Int, w: Int): Seq[Long] = {
    // independent reimplementation: per-position substring hash +
    // brute-force window minimum + first-seen distinct
    val u = UTF8String.fromString(s)
    val n = u.numChars()
    if (n < k + w - 1) return Seq.empty
    val hs = (1 to (n - k + 1)).map(i =>
      GraftExpressions.Hash64Prefix.hash(u.substringSQL(i, k)) % 1073741824L)
    val sel = scala.collection.mutable.LinkedHashSet.empty[Long]
    for (j <- (w - 1) until hs.length)
      sel += hs.slice(j - w + 1, j + 1).min
    sel.toSeq
  }

  private def winnowGot(s: String, k: Int, w: Int): Seq[Long] = {
    val a = Winnow.fingerprints(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong)
  }

  test("winnow kernel: empty, short, and boundary-length inputs") {
    assert(winnowGot("", 10, 4).isEmpty)
    assert(winnowGot("abcdefghijkl", 10, 4).isEmpty) // 12 < k+w-1 = 13
    assert(winnowGot("abcdefghijklm", 10, 4).size == 1) // exactly one window
    val s = "the quick brown fox jumps over the lazy dog again and again"
    assert(winnowGot(s, 10, 4) == winnowRef(s, 10, 4))
  }

  test("winnow kernel: non-ASCII input takes the substring fallback correctly") {
    val s = "ünïcødé ✓ 漢字テキスト with mixed ascii tails and more 字字字 padding here"
    assert(winnowGot(s, 10, 4) == winnowRef(s, 10, 4))
    // byte-range fast path and substringSQL fallback must agree on ASCII
    val ascii = "plain ascii text that is long enough for several windows"
    assert(winnowGot(ascii, 10, 4) == winnowRef(ascii, 10, 4))
  }

  test("cdc kernel: empty text and below-window text form one chunk") {
    val one = Cdc.chunks(UTF8String.fromString("ab cd"), 4, 8L)
    assert(one.numElements() == 1)
    assert(one.getStruct(0, 2).getLong(1) == 2L) // both tokens, one chunk
    val empty = Cdc.chunks(UTF8String.fromString(""), 4, 8L)
    // split("", -1) yields one empty token -> one 1-token chunk
    assert(empty.numElements() == 1)
    assert(empty.getStruct(0, 2).getLong(1) == 1L)
  }

  test("cdc kernel: chunk hashes are md5 of the space-joined tokens") {
    val text = "a b c d e f g h i j k l m n o p"
    val a = Cdc.chunks(UTF8String.fromString(text), 4, 8L)
    val toks = text.split(" ", -1)
    var covered = 0L
    (0 until a.numElements()).foreach { i =>
      val row = a.getStruct(i, 2)
      covered += row.getLong(1)
    }
    assert(covered == toks.length, "chunks must partition the token stream")
    // reassembling chunk boundaries must reproduce each chash
    var start = 0
    (0 until a.numElements()).foreach { i =>
      val row = a.getStruct(i, 2)
      val n = row.getLong(1).toInt
      val want = PortableMd5.hexDigest(
        toks.slice(start, start + n).mkString(" ").getBytes("UTF-8"))
      assert(row.getString(0) == want, s"chunk $i hash mismatch")
      start += n
    }
  }

  private def wpGot(s: String): Seq[String] = {
    val a = graft.functions.WordPiece.pieces(UTF8String.fromString(s))
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }

  test("wordpiece kernel: greedy longest match, totality, reassembly") {
    assert(wpGot("") == Seq.empty)
    // longest match wins over any shorter decomposition
    assert(wpGot("customer") == Seq("customer"))
    assert(wpGot("sorting") == Seq("sort", "ing"))
    // multi-word input: word boundaries reset the munch
    assert(wpGot("the spark") == Seq("the", "spark"))
    // unknown characters fall through as single-char pieces
    assert(wpGot("a9b") == Seq("a", "9", "b"))
    // pieces always reassemble to the input (minus spaces), and every
    // piece is either in the vocab or a single char
    val s = "streaming tablesort xqzzy the window merger"
    assert(wpGot(s).mkString == s.replace(" ", ""))
    assert(wpGot(s).forall(p =>
      graft.functions.WordPiece.Vocab.contains(p) || p.length == 1))
  }

  test("md5 kernel: hash60 is byte-identical to a fresh MessageDigest") {
    // pins the reused-digest seam against any future reimplementation
    // (r16 tried a hand-rolled RFC 1321 single-block path — it LOST to
    // the JDK's intrinsified MD5, 1.9 s vs 1.5 s per 10M 10-byte grams,
    // and was reverted; this property test is what made that experiment
    // safe). Exercises every length through both block boundaries (the
    // 0x80 pad alignment, the 55/56 one-vs-two-block cutoff) and both
    // entry points (byte-range with nonzero offset, UTF8String incl.
    // multi-byte chars whose numBytes > numChars).
    def ref(b: Array[Byte], off: Int, len: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(b, off, len)
      val d = md.digest()
      var l = 0L
      var i = 0
      while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
      l >>> 4
    }
    val rnd = new scala.util.Random(20260818L) // fixed seed: deterministic
    for (len <- 0 to 130; rep <- 0 until (if (len <= 60) 3 else 1)) {
      val pad = rnd.nextInt(5)
      val buf = new Array[Byte](pad + len + 3)
      rnd.nextBytes(buf)
      assert(PortableMd5.hash60(buf, pad, len) == ref(buf, pad, len),
        s"byte-range mismatch at len=$len pad=$pad rep=$rep")
    }
    for (s <- Seq("", "a", "käsesoßenrührlöffel", "日本語のテキスト",
        "x" * 54, "x" * 55, "x" * 56, "ü" * 28, "a b c d e f g")) {
      val u = UTF8String.fromString(s)
      val b = s.getBytes("UTF-8")
      assert(PortableMd5.hash60(u) == ref(b, 0, b.length),
        s"UTF8String mismatch for '$s'")
    }
  }
}
