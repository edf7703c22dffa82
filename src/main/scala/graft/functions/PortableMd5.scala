package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** MD5 → 60-bit-prefix hashing with a per-thread reused MessageDigest.
  * `DigestUtils.md5` calls `MessageDigest.getInstance` (a provider
  * lookup + allocation) on EVERY invocation — this seam is hit once per
  * token/shingle/gram across the whole sketch family, so the lookup was
  * pure overhead. Top-level object: generated code calls the static
  * forwarders directly.
  */
object PortableMd5 {

  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits (15 hex digits) of md5(s) — the PortableHash value. */
  def hash60(s: UTF8String): Long = {
    val md = local.get()
    md.reset()
    md.update(s.getBytes)
    prefix60(md.digest())
  }

  /** Same, over a byte range (zero-copy gram hashing). */
  def hash60(b: Array[Byte], off: Int, len: Int): Long = {
    val md = local.get()
    md.reset()
    md.update(b, off, len)
    prefix60(md.digest())
  }

  /** Lowercase-hex md5 of a UTF-8 string — the value Spark's `md5()`
    * and DuckDB's `md5()` both render.
    */
  def hexDigest(b: Array[Byte]): String = {
    val md = local.get()
    md.reset()
    md.update(b)
    val d = md.digest()
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  private def prefix60(d: Array[Byte]): Long = {
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l >>> 4
  }
}
