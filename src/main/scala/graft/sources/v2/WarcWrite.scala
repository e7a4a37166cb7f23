package graft.sources.v2

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

/** DSv2 batch write for WARC part files:
  *
  *   df.write.format("warc").option("compression", "gzip")
  *     .mode("overwrite").save(dir)
  *
  * Input contract: ONE string column (text payloads,
  * [[graft.sources.Warc.render]]) or ONE binary column (encoded HTTP
  * payloads, [[graft.sources.Warc.renderHttpEncoded]] — gzip bodies
  * are not valid UTF-8); each row is a rendered WARC record and the
  * writer terminates it with CRLF — exactly the text writer's
  * `lineSep=\r\n` semantics, so plain string output is byte-identical
  * to the text-writer sink.
  *
  * `compression=gzip` writes each record as its OWN gzip member
  * (`.warc.gz`, the Common Crawl layout): members are self-delimiting,
  * so the archive stays SPLITTABLE — the reader's member walk
  * ([[GzipWarcPartitionReader]]) starts at any member boundary.
  * Whole-file gzip (what a generic text sink with compression would
  * emit) would destroy that.
  *
  * Commit protocol: each task writes `part-<partition>-<task>` (task
  * attempt ids make concurrent speculative attempts write distinct
  * files), task commit keeps the file, task abort deletes it, job
  * abort deletes every committed file. Overwrite mode clears prior
  * part files on the driver before tasks launch (SupportsTruncate).
  */
private[v2] class WarcWriteBuilder(info: LogicalWriteInfo, dir: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val schema = info.schema()
    // string for text-payload renders (Warc.render); BINARY for
    // encoded-payload renders (Warc.renderHttpEncoded — gzip bodies
    // are not valid UTF-8 and must never round-trip through a string)
    require(schema.length == 1 && (schema.head.dataType == StringType ||
        schema.head.dataType == BinaryType),
      "the warc writer takes exactly one string or binary column (a " +
        s"rendered record per row — graft.sources.Warc.render); got ${schema.sql}")
    val gzip = Option(info.options.get("compression")) match {
      case Some("gzip") => true
      case Some("none") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"warc writer compression must be gzip|none, got '$other'")
    }
    // warcinfo=true: every part file LEADS with a warcinfo record
    // (ISO 28500 §6.2 — real crawl segments all start with one), the
    // file-level metadata record carrying WARC-Filename and an
    // application/warc-fields payload. warcinfoFilename overrides the
    // filename FIELD (not the file's name) for single-partition
    // segment writes whose consumers need a task-id-free, replayable
    // value (the CDX oracle); default is the part file's actual name.
    val warcinfo = Option(info.options.get("warcinfo")) match {
      case Some("true") => true
      case Some("false") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"warc writer warcinfo must be true|false, got '$other'")
    }
    val warcinfoFilename = Option(info.options.get("warcinfoFilename"))
    require(warcinfo || warcinfoFilename.isEmpty,
      "warcinfoFilename needs warcinfo=true")
    new WarcWrite(dir, gzip, doTruncate,
      binary = schema.head.dataType == BinaryType,
      warcinfo = warcinfo, warcinfoFilename = warcinfoFilename)
  }
}

private[v2] class WarcWrite(
    dir: String, gzip: Boolean, truncate: Boolean, binary: Boolean,
    warcinfo: Boolean = false, warcinfoFilename: Option[String] = None)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val d = new File(dir)
    if (!d.exists()) require(d.mkdirs(), s"cannot create warc sink dir $dir")
    if (truncate) {
      // clear committed part files AND orphaned in-progress dotfiles
      // (a previous run's JVM death leaves the latter behind)
      val stale = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && (f.getName.startsWith("part-") ||
          f.getName.startsWith(".part-")))
      stale.foreach(f => require(f.delete(), s"cannot clear stale $f"))
    }
    new WarcWriterFactory(dir, gzip, binary, warcinfo, warcinfoFilename)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case WarcCommitMessage(path) if path.nonEmpty =>
        val f = new File(path)
        f.delete()
        // the companion sidecar index must not outlive its part file:
        // an orphaned idx next to a later same-named file is exactly
        // the stale-adoption case the freshness check guards against
        new File(f.getParentFile, "." + f.getName + ".idx").delete()
      case _ => ()
    }
}

private[v2] case class WarcCommitMessage(path: String)
    extends WriterCommitMessage

private[v2] class WarcWriterFactory(
    dir: String, gzip: Boolean, binary: Boolean,
    warcinfo: Boolean = false, warcinfoFilename: Option[String] = None)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, gzip, partitionId, taskId, binary,
      warcinfo, warcinfoFilename)
}

/** Pass-through stream folding the head/tail content fingerprint
  * ([[WarcDataSource.contentFingerprint]]) from bytes the writer
  * already streams — it never re-reads its own output. Sits UNDER the
  * task's BufferedOutputStream, so it sees batched arrays and the
  * accounting is arraycopy-per-flush, not per-byte.
  */
private[sources] final class FingerprintStream(under: java.io.OutputStream)
    extends java.io.OutputStream {
  private val N = WarcDataSource.FingerprintBytes
  private val head = new Array[Byte](N)
  private val ring = new Array[Byte](N)
  private var total = 0L

  override def write(b: Int): Unit = {
    under.write(b)
    if (total < N) head(total.toInt) = b.toByte
    ring((total % N).toInt) = b.toByte
    total += 1
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    under.write(b, off, len)
    if (total < N) {
      val h = math.min(len.toLong, N - total).toInt
      System.arraycopy(b, off, head, total.toInt, h)
    }
    // the ring keeps the last N bytes in stream order: copy only the
    // LAST min(len, N) bytes of this chunk, wrapping at the ring end
    val t = math.min(len, N)
    val srcOff = off + len - t
    var pos = ((total + (len - t)) % N).toInt
    var copied = 0
    while (copied < t) {
      val run = math.min(t - copied, N - pos)
      System.arraycopy(b, srcOff + copied, ring, pos, run)
      pos = (pos + run) % N
      copied += run
    }
    total += len
  }

  override def flush(): Unit = under.flush()
  override def close(): Unit = under.close()

  /** The fingerprint of everything written so far (call after close). */
  def fingerprint: Long = {
    val headLen = math.min(total, N.toLong).toInt
    val tailLen = headLen
    val tail = new Array[Byte](tailLen)
    var i = 0
    while (i < tailLen) {
      tail(i) = ring(((total - tailLen + i) % N).toInt)
      i += 1
    }
    WarcDataSource.contentFingerprint(head, headLen, tail, tailLen)
  }
}

private[v2] class WarcDataWriter(
    dir: String, gzip: Boolean, partitionId: Int, taskId: Long,
    binary: Boolean = false, warcinfo: Boolean = false,
    warcinfoFilename: Option[String] = None)
    extends DataWriter[InternalRow] {
  private val ext = if (gzip) ".warc.gz" else ".warc"
  private val path = f"$dir/part-$partitionId%05d-$taskId$ext"
  // task-commit protocol: write under a DOTTED temp name (expandPaths
  // never lists dotfiles, so a half-written file is invisible to
  // readers even if the JVM dies without abort()), rename to the final
  // name only at task commit — a retried task can then never leave a
  // partial part file next to its successor's output
  private val tmpPath = f"$dir/.part-$partitionId%05d-$taskId$ext.inprogress"
  private val tmpIdxPath = f"$dir/.part-$partitionId%05d-$taskId$ext.idx.inprogress"
  // opened on the FIRST record: an empty input partition must not
  // leave an empty part file behind
  private var out: BufferedOutputStream = _
  // fingerprint tap under the buffer (head/tail CRC for the sidecar)
  private var fp: FingerprintStream = _
  // ONE deflater + CRC per task, reset() per member — a fresh
  // java.util.zip.GZIPOutputStream per record would allocate (and,
  // since finish() does not end() it, LEAK) a native zlib stream per
  // record; measured at grow_sf1 that degraded the whole JVM 4×
  private val deflater =
    if (gzip) new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    else null
  private val crc = new java.util.zip.CRC32
  private val dbuf = new Array[Byte](64 * 1024)
  // RFC 1952 member framing shared with the gzip_compress expression
  // (graft.functions.HttpCodec): ONE definition of the deterministic
  // header and trailer encoding, so sink members and expression
  // members stay byte-identical by construction
  private val GzHeader = graft.functions.HttpCodec.GzHeader
  private val CrLf = Array[Byte]('\r', '\n')

  private def writeIntLE(v: Long): Unit =
    graft.functions.HttpCodec.writeIntLE(out, v)

  // Sidecar split index: record-boundary marks every ~64 KiB of output
  // (offset after record i, records written so far), emitted at task
  // commit as `.{part}.idx`. The planner reads the marks instead of
  // skimming — for gz that removes planning-side DECOMPRESSION of the
  // whole archive; for plain it removes the header walk. Memory is one
  // tuple per 64 KiB — bounded and tiny.
  private var bytesOut = 0L
  private var recordsOut = 0L
  private var lastMark = 0L
  private val marks = Seq.newBuilder[(Long, Long)]

  /** The ONE copy of per-record byte/record/sidecar-mark accounting —
    * warcinfo records and data records must agree on it or
    * `record_index` and split marks skew per record type.
    */
  private def accountRecord(n: Long): Unit = {
    bytesOut += n
    recordsOut += 1
    if (bytesOut - lastMark >= WarcDataSource.SidecarMarkBytes) {
      marks += ((bytesOut, recordsOut)); lastMark = bytesOut
    }
  }

  /** One COMPLETE record (its terminating CRLFCRLF included): as its
    * own gzip member in gz mode — so concatenated decompressed members
    * form a valid WARC stream — plain bytes otherwise; either way the
    * sidecar mark accounting counts it, keeping `record_index` exact.
    */
  private def emitRecord(rec: Array[Byte]): Unit = {
    if (gzip) {
      out.write(GzHeader)
      crc.reset(); crc.update(rec)
      deflater.reset()
      deflater.setInput(rec); deflater.finish()
      var deflated = 0L
      while (!deflater.finished()) {
        val n = deflater.deflate(dbuf)
        if (n > 0) { out.write(dbuf, 0, n); deflated += n }
      }
      writeIntLE(crc.getValue)
      writeIntLE(rec.length.toLong & 0xffffffffL)
      accountRecord(GzHeader.length + deflated + 8)
    } else {
      out.write(rec)
      accountRecord(rec.length.toLong)
    }
  }

  /** The file-head warcinfo record (ISO 28500 §6.2): WARC-Filename
    * names the part file (or the caller's override — see the builder),
    * the payload is the fixed [[graft.sources.Warc.WarcinfoFields]],
    * and the record id derives from the filename, so the whole record
    * is deterministic given the name. Emitted through [[emitRecord]],
    * so offsets, sidecar marks, and `record_index` all account for it.
    */
  private def writeWarcinfo(): Unit = {
    val fname = warcinfoFilename.getOrElse(new File(path).getName)
    val payload =
      graft.sources.Warc.WarcinfoFields.getBytes(StandardCharsets.UTF_8)
    val md = java.security.MessageDigest.getInstance("MD5")
    val id = md.digest(("warcinfo:" + fname).getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val head = (s"WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:md5:$id>\r\n" +
      "WARC-Date: 2020-01-01T00:00:00Z\r\n" +
      s"WARC-Filename: $fname\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    emitRecord(head ++ payload ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      fp = new FingerprintStream(new FileOutputStream(tmpPath))
      out = new BufferedOutputStream(fp, 1 << 20)
      // lazily with the first data record: an empty partition leaves
      // no file, so it must not leave a warcinfo-only one either
      if (warcinfo) writeWarcinfo()
    }
    val s = if (binary) row.getBinary(0) else row.getUTF8String(0).getBytes
    // the rendered record ends "...payload\r\n"; the writer's CRLF
    // completes the spec's double-CRLF record separator. gz needs the
    // complete record in one array (one member per record); the plain
    // path streams the two pieces and skips the copy.
    if (gzip) {
      val rec = java.util.Arrays.copyOf(s, s.length + 2)
      rec(s.length) = '\r'; rec(s.length + 1) = '\n'
      emitRecord(rec)
    } else {
      out.write(s); out.write(CrLf)
      accountRecord(s.length.toLong + 2)
    }
  }

  private def release(): Unit = {
    if (deflater != null) deflater.end()
    if (out != null) out.close()
  }

  override def commit(): WriterCommitMessage = {
    release()
    if (out == null) return WarcCommitMessage("")
    // ORDER MATTERS: move the data file to its final name FIRST, then
    // write the sidecar (via its own temp+rename) — a final-named idx
    // must never exist without its final-named data file, or a crash
    // between the two leaves an orphan for a later same-named part to
    // adopt (the fingerprint would reject it, but the invariant is
    // cheaper than the recovery)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tmpPath), java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val f = new File(path)
    val idx = new File(f.getParentFile, "." + f.getName + ".idx")
    val lines = new StringBuilder(
      s"${WarcDataSource.SidecarMagic} $bytesOut $recordsOut ${fp.fingerprint}\n")
    for ((off, recs) <- marks.result()) lines.append(s"$off $recs\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmpIdxPath), lines.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tmpIdxPath), idx.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    WarcCommitMessage(path)
  }
  override def abort(): Unit = {
    release()
    // every name this attempt can have created: the in-progress data
    // file, the in-progress idx, and — when commit() failed between
    // its two moves — the final-named data file (attempt-unique names,
    // so this can never delete another attempt's output)
    new File(tmpPath).delete()
    new File(tmpIdxPath).delete()
    new File(path).delete()
  }
  override def close(): Unit = release()
}
