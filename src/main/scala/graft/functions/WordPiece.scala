package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style greedy maximal-munch tokenization (Wu et al. 2016's
  * inference rule: at each position consume the LONGEST vocabulary
  * piece) as one linear pass per document — the `graft_winnow` kernel
  * discipline: a top-level object so generated code calls the static
  * forwarder, no per-token relational fan-out, and the whole projection
  * stays in whole-stage codegen.
  *
  * The vocabulary is a fixed literal (domain pieces + every single
  * letter, so the munch is total on the corpus alphabet and no [UNK]
  * path is needed); the SQL oracle renders the SAME list as a VALUES
  * relation and replays the same longest-match recurrence with a
  * recursive CTE, so segmentation is verified exactly.
  */
object WordPiece {

  /** Multi-char pieces first (segmentation-relevant), then the a–z
    * fallback alphabet. Order is irrelevant to matching — longest wins.
    */
  val Vocab: Seq[String] = Seq(
    "spark", "stream", "filter", "window", "join", "query", "table",
    "batch", "merge", "hash", "scan", "sort", "data", "row", "key",
    "line", "order", "group", "value", "vector", "column", "customer",
    "er", "ing", "st", "ar", "or", "an", "the", "val", "ta", "ch") ++
    ('a' to 'z').map(_.toString)

  private val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Vocab.foreach(s.add)
    s
  }
  private val maxLen = Vocab.map(_.length).max

  def pieces(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var wStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        var pos = wStart
        while (pos < i) {
          var l = math.min(maxLen, i - pos)
          var matched = 0
          while (matched == 0 && l >= 1) {
            if (set.contains(str.substring(pos, pos + l))) matched = l
            else l -= 1
          }
          // alphabet totality means matched ≥ 1 for a–z text; any char
          // outside the vocab alphabet passes through as itself
          val take = if (matched > 0) matched else 1
          out += UTF8String.fromString(str.substring(pos, pos + take))
          pos += take
        }
        wStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The vocabulary as a DuckDB VALUES body: `('spark', 5), …`. */
  def vocabSqlValues: String =
    Vocab.map(p => s"('$p', ${p.length})").mkString(", ")
}
