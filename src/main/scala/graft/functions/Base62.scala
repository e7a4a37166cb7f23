package graft.functions

/** Base-62 encoding of a hex digest, matching the `base-62.js`
  * dependency the reference uses for toponym ids
  * (/root/reference/building-inspector.js:8,209; package.json:23).
  *
  * The npm package's `encodeHex` interprets the hex string as one big
  * integer and re-encodes it in the alphabet 0-9, a-z, A-Z. The dep is
  * not vendored in the reference, so the alphabet choice is pinned by
  * this engine's own golden tests.
  */
object Base62 {
  private val Alphabet = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

  def encodeHex(hex: String): String = {
    if (hex.isEmpty) return ""
    var n = BigInt(hex, 16)
    if (n == 0) return "0"
    val sb = new StringBuilder
    while (n > 0) {
      sb.append(Alphabet((n % 62).toInt))
      n /= 62
    }
    sb.reverseContents().toString
  }
}
