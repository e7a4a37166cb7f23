package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** MD5 kernels for the catalogue's universal deterministic-hash device
  * `CAST(conv(substring(md5(concat(...)), 1, n), 16, 10) AS BIGINT)`
  * and for full-hex md5 keys.
  *
  * Spark's builtin `Md5` calls commons-codec `DigestUtils.md5Hex`,
  * which constructs a NEW MessageDigest per row, hex-encodes all 16
  * bytes to a String, wraps it in a UTF8String — and the device then
  * re-parses a substring of that hex through `conv`. These kernels
  * keep one MessageDigest per thread and fold the first n hex digits
  * straight out of the digest bytes (no hex string, no conv parse),
  * producing BIT-IDENTICAL results (verified against the SQL form in
  * KernelSpec and by the unchanged DuckDB oracles).
  *
  * Multi-part entry points digest the concatenation of the parts'
  * UTF-8 bytes — exactly `md5(concat(p1, p2, ...))` — without
  * materializing the concatenated string.
  */
object Md5Kernel {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  /** Raw 16-byte digest of the concatenated parts' UTF-8 bytes. */
  def digest(parts: Array[UTF8String]): Array[Byte] = {
    val m = md.get()
    m.reset()
    var i = 0
    while (i < parts.length) {
      val b = parts(i).getBytes
      m.update(b, 0, b.length)
      i += 1
    }
    m.digest()
  }

  /** Value of the first `nHex` hex digits of the md5, as a BIGINT —
    * `CAST(conv(substring(md5(concat(parts...)), 1, nHex), 16, 10) AS
    * BIGINT)` for 1 <= nHex <= 15 (always fits a positive long).
    */
  def prefixLong(nHex: Int, parts: Array[UTF8String]): Long = {
    val d = digest(parts)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  /** Full 32-char lowercase hex digest — `md5(concat(parts...))`. */
  def hex(parts: Array[UTF8String]): UTF8String = {
    val d = digest(parts)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = HEX(b >> 4)
      out(2 * i + 1) = HEX(b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
