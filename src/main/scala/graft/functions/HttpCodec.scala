package graft.functions

/** Byte-level codecs for REAL crawl HTTP payloads — chunked
  * transfer-encoding (RFC 9112 §7.1) and gzip content-encoding
  * (RFC 1952) — backing the codegen'd expressions in
  * [[graft.functions]] (`ChunkedEncode`/`ChunkedDecode`/
  * `GzipCompress`/`GzipDecompress`). Common Crawl response records
  * are routinely chunked and/or gzip-encoded with a declared charset;
  * a consumer that casts payload bytes to UTF-8 (the round-12
  * `pipe_warc_http_parse` shape) mis-reads them, which is why the
  * decode belongs in the engine as per-row expressions.
  *
  * The gzip side reuses the WARC sink's discipline: deterministic
  * member framing (MTIME=0, OS=255 — no timestamps, so fixtures and
  * re-renders are byte-stable) and ONE native zlib stream per thread,
  * reset per call — never allocated per row (the measured
  * native-leak/4×-degradation failure mode from round 12, see
  * sources/v2/WarcWrite.scala).
  */
object HttpCodec {

  /** RFC 1952 member header: magic, CM=deflate, FLG=0, MTIME=0,
    * XFL=0, OS=255 — THE deterministic member framing, shared with
    * the WARC gzip sink (sources/v2/WarcWrite.scala) so the
    * expression and the sink cannot drift byte-wise.
    */
  private[graft] val GzHeader = Array[Byte](0x1f, 0x8b.toByte, 8, 0,
    0, 0, 0, 0, 0, 0xff.toByte)

  /** Little-endian uint32, the RFC 1952 trailer encoding (shared with
    * the WARC gzip sink).
    */
  private[graft] def writeIntLE(out: java.io.OutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  // one native zlib stream per THREAD, reset per call: executor task
  // threads are long-lived and bounded, so this is the no-leak,
  // no-per-row-native-churn shape
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true))
  private val inflaters = ThreadLocal.withInitial[java.util.zip.Inflater](
    () => new java.util.zip.Inflater(true))

  /** Deterministic single-member gzip of `bytes`. */
  def gzipCompress(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    out.write(GzHeader, 0, GzHeader.length)
    val deflater = deflaters.get()
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    writeIntLE(out, crc.getValue)
    writeIntLE(out, bytes.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Inflate one gzip member, validating magic, CRC32 and ISIZE — the
    * GzipMemberStream discipline at expression granularity. Accepts
    * exactly one member (a content-encoded HTTP body is one member;
    * trailing bytes mean a mis-split upstream and abort loudly).
    */
  def gzipDecompress(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 18 && bytes(0) == 0x1f && bytes(1) == 0x8b.toByte,
      s"gzip_decompress: not a gzip member (${bytes.length} bytes)")
    require(bytes(2) == 8, s"gzip_decompress: unsupported method ${bytes(2)}")
    val flg = bytes(3) & 0xff
    var p = 10
    // optional-field parsing stays bounds-checked so a truncated or
    // lying header aborts with the codec's own message, never a raw
    // ArrayIndexOutOfBounds from deep inside a codegen'd expression
    val deflateEnd = bytes.length - 8 // trailer must remain
    def need(n: Int, what: String): Unit =
      require(p + n <= deflateEnd,
        s"gzip_decompress: member truncated inside $what (offset $p)")
    if ((flg & 0x04) != 0) { // FEXTRA
      need(2, "FEXTRA length")
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      need(2 + xlen, "FEXTRA")
      p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { // FNAME
      while (p < deflateEnd && bytes(p) != 0) p += 1
      need(1, "FNAME"); p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (p < deflateEnd && bytes(p) != 0) p += 1
      need(1, "FCOMMENT"); p += 1
    }
    if ((flg & 0x02) != 0) { need(2, "FHCRC"); p += 2 }
    require(p <= deflateEnd,
      s"gzip_decompress: header fields overrun the member (offset $p)")
    val inflater = inflaters.get()
    inflater.reset()
    inflater.setInput(bytes, p, bytes.length - p - 8)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 64)
    val buf = new Array[Byte](8192)
    while (!inflater.finished()) {
      require(!inflater.needsInput(),
        "gzip_decompress: member truncated mid-deflate")
      val n = inflater.inflate(buf)
      if (n > 0) {
        require(out.size().toLong + n <= Int.MaxValue - 16,
          "gzip_decompress: body inflates past 2 GiB")
        out.write(buf, 0, n)
      } else require(!inflater.needsDictionary(),
        "gzip_decompress: member needs a preset dictionary")
    }
    val trailerAt = p + (bytes.length - p - 8 - inflater.getRemaining)
    require(inflater.getRemaining == 0 && trailerAt + 8 == bytes.length,
      "gzip_decompress: trailing bytes after the member — not a single " +
        "content-encoded body?")
    val result = out.toByteArray
    val crc = readIntLE(bytes, trailerAt)
    val isize = readIntLE(bytes, trailerAt + 4)
    val check = new java.util.zip.CRC32
    check.update(result)
    require(check.getValue == crc, "gzip_decompress: CRC mismatch")
    require(isize == (result.length.toLong & 0xffffffffL),
      s"gzip_decompress: ISIZE=$isize but inflated ${result.length} bytes")
    result
  }

  private def readIntLE(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  // zlib-WRAPPED (RFC 1950) streams for the "deflate" content-coding —
  // RFC 9110's actual meaning of `Content-Encoding: deflate`. A
  // separate thread-local pair from the raw streams above: nowrap is
  // fixed at Inflater/Deflater construction.
  private val zlibDeflaters = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, false))
  private val zlibInflaters = ThreadLocal.withInitial[java.util.zip.Inflater](
    () => new java.util.zip.Inflater(false))

  private def deflateWith(
      deflater: java.util.zip.Deflater, bytes: Array[Byte]): Array[Byte] = {
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** Deterministic zlib-wrapped deflate (what a CORRECT server sends
    * for `Content-Encoding: deflate`).
    */
  def deflateCompress(bytes: Array[Byte]): Array[Byte] =
    deflateWith(zlibDeflaters.get(), bytes)

  /** Deterministic RAW deflate — the famous server bug (RFC 9110
    * §8.4.1.2 notes "some non-conformant implementations send the
    * 'deflate' compressed data without the zlib wrapper"); rendered
    * by the fixture so the decoder's sniffing fallback is GATED, not
    * just spec'd.
    */
  def deflateCompressRaw(bytes: Array[Byte]): Array[Byte] =
    deflateWith(deflaters.get(), bytes)

  /** Decode a `Content-Encoding: deflate` body the way browsers do:
    * sniff the two-byte zlib header (CM=8, CMF/FLG checksum divisible
    * by 31 — RFC 1950 §2.2) and inflate wrapped (ADLER32 validated by
    * the Inflater) or raw accordingly. Truncation, trailing bytes,
    * and corrupt streams abort loudly with the codec's own message.
    */
  def deflateDecompress(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.nonEmpty, "deflate_decompress: empty body")
    val zlib = bytes.length >= 2 && (bytes(0) & 0x0f) == 8 &&
      ((((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)) % 31 == 0)
    val inflater = if (zlib) zlibInflaters.get() else inflaters.get()
    inflater.reset()
    inflater.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inflater.finished()) {
        require(!inflater.needsInput(),
          "deflate_decompress: body truncated mid-stream")
        val n = inflater.inflate(buf)
        if (n > 0) {
          require(out.size().toLong + n <= Int.MaxValue - 16,
            "deflate_decompress: body inflates past 2 GiB")
          out.write(buf, 0, n)
        } else require(!inflater.needsDictionary(),
          "deflate_decompress: stream needs a preset dictionary")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"deflate_decompress: corrupt ${if (zlib) "zlib" else "raw"} " +
            s"stream: ${e.getMessage}")
    }
    require(inflater.getRemaining == 0,
      s"deflate_decompress: ${inflater.getRemaining} trailing bytes " +
        "after the stream — not a single content-encoded body?")
    out.toByteArray
  }

  /** Render `bytes` as an RFC 9112 chunked body: lowercase-hex size
    * line, chunk data, CRLF per chunk, terminated `0 CRLF CRLF`.
    */
  def chunkedEncode(bytes: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize > 0, s"chunked_encode: chunkSize=$chunkSize")
    val out = new java.io.ByteArrayOutputStream(bytes.length + 64)
    var off = 0
    while (off < bytes.length) {
      val n = math.min(chunkSize, bytes.length - off)
      out.write(java.lang.Integer.toHexString(n).getBytes("US-ASCII"))
      out.write('\r'); out.write('\n')
      out.write(bytes, off, n)
      out.write('\r'); out.write('\n')
      off += n
    }
    out.write('0'); out.write('\r'); out.write('\n')
    out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** Decode an RFC 9112 chunked body: hex size lines (either case,
    * `;`-separated chunk extensions tolerated), per-chunk CRLF
    * validated, optional trailer section after the 0-chunk skipped.
    * Malformed framing aborts loudly — a chunk-length that disagrees
    * with the bytes present must never yield a silently short body.
    */
  def chunkedDecode(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var p = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
        i += 1
      require(i + 1 < bytes.length,
        s"chunked_decode: no CRLF after offset $from")
      i
    }
    while (true) {
      val e = lineEnd(p)
      var sizeStr = new String(bytes, p, e - p, "US-ASCII")
      val semi = sizeStr.indexOf(';')
      if (semi >= 0) sizeStr = sizeStr.substring(0, semi)
      sizeStr = sizeStr.trim
      require(sizeStr.nonEmpty && sizeStr.forall(c =>
          Character.digit(c, 16) >= 0),
        s"chunked_decode: bad chunk-size line '$sizeStr' at $p")
      // length-bound BEFORE parseLong: a 17+-hex-digit size line must
      // get this message, not a raw NumberFormatException
      val trimmed = sizeStr.dropWhile(_ == '0')
      require(trimmed.length <= 8,
        s"chunked_decode: chunk-size '$sizeStr' at $p is absurdly large")
      val n = if (trimmed.isEmpty) 0L else java.lang.Long.parseLong(trimmed, 16)
      require(n <= Int.MaxValue - 16, s"chunked_decode: chunk of $n bytes")
      p = e + 2
      if (n == 0L) {
        // trailer section: zero or more header lines, then a bare CRLF
        var done = false
        while (!done) {
          require(p + 2 <= bytes.length,
            "chunked_decode: truncated trailer section")
          if (bytes(p) == '\r' && bytes(p + 1) == '\n') {
            p += 2
            done = true
          } else {
            p = lineEnd(p) + 2
          }
        }
        require(p == bytes.length,
          s"chunked_decode: ${bytes.length - p} trailing bytes after the " +
            "terminal chunk")
        return out.toByteArray
      }
      require(p + n + 2 <= bytes.length,
        s"chunked_decode: chunk of $n bytes at $p overruns the body")
      out.write(bytes, p, n.toInt)
      p += n.toInt
      require(bytes(p) == '\r' && bytes(p + 1) == '\n',
        s"chunked_decode: chunk at $p not followed by CRLF")
      p += 2
    }
    throw new IllegalStateException("unreachable")
  }
}
