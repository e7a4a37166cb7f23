package graft.sources.v2

import java.io.{EOFException, InputStream}
import java.util.zip.Inflater

/** Streaming multi-member gzip reader with EXACT raw-offset
  * accounting — the device that keeps `.warc.gz` splittable.
  *
  * Real crawl archives (Common Crawl segments) are written as one
  * gzip MEMBER per WARC record (RFC 1952 allows concatenated
  * members); members are self-delimiting, so raw byte offsets of
  * member boundaries are valid split points exactly like record
  * offsets in a plain `.warc`. `java.util.zip.GZIPInputStream` cannot
  * provide those offsets (it reads ahead across member boundaries and
  * loses the raw position), so this class drives an `Inflater`
  * directly over its own buffer: after each member it knows the
  * PRECISE offset of the next one (`offset`), and a reader positioned
  * at any member boundary can start mid-file.
  *
  * Framing is validated loudly, matching the plain reader's
  * discipline: bad magic, truncated members, and an ISIZE trailer
  * that disagrees with the inflated size all abort with path + byte
  * offset, never a silent short scan.
  */
private[graft] final class GzipMemberStream(
    raw: InputStream, path: String, base: Long = 0L) {
  private val buf = new Array[Byte](64 * 1024)
  private var len = 0 // valid bytes in buf
  private var pos = 0 // next unconsumed index in buf
  // `base` = the FILE offset `raw` is already positioned at (a reader
  // seeks to its split start before wrapping), so `offset` stays an
  // absolute file offset comparable to split bounds
  private var pulled = base

  /** File offset of the next unconsumed byte. */
  def offset: Long = pulled - (len - pos)

  // ONE inflater for the stream's lifetime, reset() per member — a
  // per-record-member archive walks tens of thousands of members per
  // split, and allocating a native zlib stream per member is the
  // writer-side leak's read-side twin. Callers release via end().
  private val inflater = new Inflater(true)
  private val tmp = new Array[Byte](64 * 1024)

  /** Release the native inflater (call once, when done with the file). */
  def end(): Unit = inflater.end()

  private def ensure(): Boolean = {
    if (pos < len) return true
    val n = raw.read(buf)
    if (n < 0) false
    else { pulled += n; len = n; pos = 0; true }
  }

  private def readByte(at: Long): Int = {
    if (!ensure()) throw new EOFException(
      s"gzip member at $path:$at truncated (unexpected EOF)")
    val b = buf(pos) & 0xff; pos += 1; b
  }

  private def skipBytes(n: Int, at: Long): Unit = {
    var left = n
    while (left > 0) {
      if (!ensure()) throw new EOFException(
        s"gzip member at $path:$at truncated (header/trailer short)")
      val take = math.min(left, len - pos)
      pos += take; left -= take
    }
  }

  /** Read one complete gzip member from the current offset. None at
    * clean EOF (positioned exactly at end-of-file).
    */
  def readMember(): Option[Array[Byte]] = {
    val start = offset
    if (!ensure()) return None
    val b0 = readByte(start)
    val b1 = readByte(start)
    require(b0 == 0x1f && b1 == 0x8b,
      f"not a gzip member at $path:$start (magic 0x$b0%02x$b1%02x)")
    val cm = readByte(start)
    require(cm == 8, s"unsupported gzip compression method $cm at $path:$start")
    val flg = readByte(start)
    skipBytes(6, start) // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = readByte(start) | (readByte(start) << 8)
      skipBytes(xlen, start)
    }
    if ((flg & 0x08) != 0) while (readByte(start) != 0) () // FNAME
    if ((flg & 0x10) != 0) while (readByte(start) != 0) () // FCOMMENT
    if ((flg & 0x02) != 0) skipBytes(2, start) // FHCRC
    inflater.reset()
    val out = new java.io.ByteArrayOutputStream(64 * 1024)
    while (!inflater.finished()) {
      if (inflater.needsInput()) {
        if (!ensure()) throw new EOFException(
          s"gzip member at $path:$start truncated mid-deflate")
        inflater.setInput(buf, pos, len - pos)
        pos = len // provisional; the unconsumed tail is returned below
      }
      val n = inflater.inflate(tmp)
      if (n > 0) {
        // cap cumulative inflated size BEFORE the buffer grows: a
        // pathological multi-GB single-member archive must abort with
        // path+offset (the plain reader's 2 GiB payload discipline),
        // not an opaque array-size OOM mid-inflate
        require(out.size().toLong + n <= Int.MaxValue - 16,
          s"gzip member at $path:$start inflates past ${Int.MaxValue - 16} " +
            "bytes; single-record payloads above 2 GiB are not supported")
        out.write(tmp, 0, n)
      } else require(!inflater.needsDictionary(),
        s"gzip member at $path:$start needs a preset dictionary")
    }
    pos -= inflater.getRemaining // hand back the unconsumed tail
    // trailer: CRC32(4) + ISIZE(4), little-endian; validate ISIZE so a
    // framing bug surfaces here, not as a corrupt downstream parse
    var crc = 0L; var isize = 0L
    var i = 0
    while (i < 4) { crc |= readByte(start).toLong << (8 * i); i += 1 }
    i = 0
    while (i < 4) { isize |= readByte(start).toLong << (8 * i); i += 1 }
    val bytes = out.toByteArray
    require(isize == (bytes.length & 0xffffffffL),
      s"gzip member at $path:$start ISIZE=$isize but inflated " +
        s"${bytes.length} bytes — corrupt member?")
    val check = new java.util.zip.CRC32
    check.update(bytes)
    require(check.getValue == crc,
      s"gzip member at $path:$start CRC mismatch — corrupt member?")
    Some(bytes)
  }
}
