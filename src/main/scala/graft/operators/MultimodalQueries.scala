package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Multimodal-column support: media travels as an opaque `binary`
  * column plus typed metadata, exactly as image/audio/video would in a
  * 100 TB training-data lake. The decode step runs a REAL image codec
  * (javax.imageio — PNG/JPEG/GIF/BMP) on payloads that parse as
  * images, and falls back to a deterministic md5-derived pseudo-decode
  * for everything else — the quarantine-row pattern for corrupt media.
  * The `documents`-backed catalogue queries exercise the fallback arm
  * (text bytes are never valid images), keeping them oracle-checkable;
  * the real arm is spec-verified with an actual PNG round-trip.
  *
  * Scale notes: decode runs per-partition (mapPartitions) so the codec
  * amortizes init per batch; payloads never shuffle — only extracted
  * features/metadata do.
  */
object Multimodal {

  /** A media record: opaque payload + whatever metadata the lake has. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

  /** Decoded output: metadata + a fixed-shape feature vector. */
  final case class MediaDecoded(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      feat0: Double,
  )

  /** DETERMINISTIC FALLBACK for non-image payloads: md5-derived
    * pseudo-decode. Keeps every byte stream decodable — exactly what a
    * production pipeline does with a quarantine/default row for
    * corrupt media — and keeps the `documents`-backed oracle queries
    * replayable (their text payloads are never valid images).
    * Pure function of the payload bytes.
    */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Double) = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
    def ub(i: Int): Int = md5(i) & 0xff
    val format = if (ub(0) < 86) "png" else if (ub(0) < 171) "jpeg" else "webp"
    val width = 64 + ub(1)
    val height = 64 + ub(2)
    val feat0 = ub(3).toDouble / 255.0
    (format, width, height, feat0)
  }

  /** Upper bound on either pixel dimension the decoder will read: a
    * tiny payload whose header CLAIMS huge dimensions would otherwise
    * make `reader.read(0)` eagerly allocate the declared raster — a
    * decompression-bomb OOM, not a decode.
    */
  val MaxPixelDim = 16384

  /** True iff the payload starts with a known raster-image signature:
    * PNG/JPEG/GIF/BMP/TIFF — the formats the JDK's ImageIO ships
    * readers for (JDK 9+ also bundles TIFF; WBMP is deliberately NOT
    * sniffed — its "signature" is two near-arbitrary bytes, so a
    * prefix test would wave through random binary and defeat the
    * point of the sniff; WBMP payloads fall to [[decodeStub]] by
    * design). Checked BEFORE constructing an ImageInputStream: on a
    * predominantly-text corpus the per-payload stream + reader-probe
    * allocation is pure overhead, and a 4-byte prefix test rejects
    * non-images for free.
    */
  def looksLikeImage(payload: Array[Byte]): Boolean = {
    if (payload.length < 4) return false
    def b(i: Int): Int = payload(i) & 0xff
    (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
    (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) ||              // JPEG
    (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||  // GIF
    (b(0) == 'B' && b(1) == 'M') ||                                // BMP
    (b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a && b(3) == 0) ||   // TIFF LE
    (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a)      // TIFF BE
  }

  /** Real codec path: decode the payload with javax.imageio when its
    * bytes carry an image signature AND parse, reporting the actual
    * format, pixel dimensions, and the mean-luma-of-origin-pixel
    * feature; fall back to [[decodeStub]] for anything else. Corrupt
    * containers quarantine on ANY non-fatal throw — ImageIO readers
    * surface truncation as RuntimeException subclasses
    * (IllegalArgumentException, ArrayIndexOutOfBoundsException,
    * CMMException) as often as IOException — and header-declared
    * dimensions are bounded before `read(0)` allocates them.
    */
  def decodePayload(payload: Array[Byte]): (String, Int, Int, Double) = {
    if (!looksLikeImage(payload)) return decodeStub(payload)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) decodeStub(payload)
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val format = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          if (reader.getWidth(0) > MaxPixelDim || reader.getHeight(0) > MaxPixelDim)
            decodeStub(payload)
          else {
            val img = reader.read(0)
            val argb = img.getRGB(0, 0)
            val luma = (((argb >> 16) & 0xff) * 0.299 +
              ((argb >> 8) & 0xff) * 0.587 + (argb & 0xff) * 0.114) / 255.0
            (format, img.getWidth, img.getHeight, luma)
          }
        } finally reader.dispose()
      }
    } catch {
      // truncated/corrupt image container: quarantine-style fallback
      // (OOM and friends still propagate)
      case scala.util.control.NonFatal(_) => decodeStub(payload)
    } finally if (iis != null) iis.close()
  }

  /** The batch-decode operator: per-partition iteration over typed
    * rows — the real codec initializes its ImageIO machinery once per
    * JVM and streams each partition's payloads through
    * [[decodePayload]].
    */
  def decode(rows: Dataset[MediaRow]): Dataset[MediaDecoded] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (format, width, height, feat0) = decodePayload(r.payload)
        MediaDecoded(r.doc_id, r.payload.length, format, width, height, feat0)
      }
    }
  }

  /** documents.text reinterpreted as an opaque binary payload. */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"), $"source")
      .as[MediaRow]
  }
}

object MultimodalQueries {

  // Metadata extraction over the binary column (no decode).
  private val metadata = Q(
    "mm_binary_metadata",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .select(
          $"doc_id",
          length($"payload").as("n_bytes"),
          md5($"payload").as("payload_md5"),
        )
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           |       md5(text) AS payload_md5
           |FROM documents
           |ORDER BY doc_id""".stripMargin),
  )

  // Full typed decode path through mapPartitions; the md5-derived stub
  // makes even the "decoded" fields oracle-checkable.
  private val decode = Q(
    "mm_decode_features",
    (s, d) => {
      import s.implicits._
      Multimodal.decode(Multimodal.asMedia(s, d))
        .toDF()
        .select($"doc_id", $"n_bytes", $"format", $"width", $"height")
        .orderBy($"doc_id")
    },
    Some("""WITH h AS (
           |  SELECT doc_id,
           |         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           |         md5(text) AS m
           |  FROM documents)
           |SELECT doc_id, n_bytes,
           |       CASE WHEN CAST('0x' || substr(m, 1, 2) AS INT) < 86 THEN 'png'
           |            WHEN CAST('0x' || substr(m, 1, 2) AS INT) < 171 THEN 'jpeg'
           |            ELSE 'webp' END AS format,
           |       64 + CAST('0x' || substr(m, 3, 2) AS INT) AS width,
           |       64 + CAST('0x' || substr(m, 5, 2) AS INT) AS height
           |FROM h
           |ORDER BY doc_id""".stripMargin),
  )

  // Resize: pure metadata transform over the stub-decoded dimensions —
  // fit-within-256 preserving aspect ratio via exact integer math.
  private val resize = Q(
    "mm_resize",
    (s, d) => {
      import s.implicits._
      Multimodal.decode(Multimodal.asMedia(s, d))
        .toDF()
        .select(
          $"doc_id", $"width", $"height",
          when(greatest($"width", $"height") <= 256, $"width")
            .otherwise(expr("CAST(width * 256 DIV greatest(width, height) AS INT)"))
            .as("out_width"),
          when(greatest($"width", $"height") <= 256, $"height")
            .otherwise(expr("CAST(height * 256 DIV greatest(width, height) AS INT)"))
            .as("out_height"),
        )
        .orderBy($"doc_id")
    },
    Some("""WITH h AS (
           |  SELECT doc_id,
           |         64 + CAST('0x' || substr(md5(text), 3, 2) AS INT) AS width,
           |         64 + CAST('0x' || substr(md5(text), 5, 2) AS INT) AS height
           |  FROM documents)
           |SELECT doc_id, width, height,
           |       CASE WHEN greatest(width, height) <= 256 THEN width
           |            ELSE CAST(width * 256 // greatest(width, height) AS INT)
           |       END AS out_width,
           |       CASE WHEN greatest(width, height) <= 256 THEN height
           |            ELSE CAST(height * 256 // greatest(width, height) AS INT)
           |       END AS out_height
           |FROM h
           |ORDER BY doc_id""".stripMargin),
  )

  // Frame sampling: the stub "video" has md5-derived frame count; emit
  // every 5th frame as its own row (posexplode over the frame index
  // sequence — the generator plumbing a real frame extractor feeds).
  private val frameSample = Q(
    "mm_frame_sample",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          (expr("CAST(conv(substring(md5(text), 7, 2), 16, 10) AS INT)") + 10)
            .as("n_frames"))
        .select($"doc_id", $"n_frames",
          posexplode(sequence(lit(0), $"n_frames" - 1, lit(5)))
            .as(Seq("sample_idx", "frame_idx")))
        .select(
          $"doc_id",
          $"sample_idx",
          $"frame_idx",
          ($"frame_idx" * 40L).as("ts_ms"), // 25 fps
        )
        .orderBy($"doc_id", $"sample_idx")
    },
    Some("""WITH f AS (
           |  SELECT doc_id,
           |         CAST('0x' || substr(md5(text), 7, 2) AS INT) + 10 AS n_frames
           |  FROM documents)
           |SELECT doc_id,
           |       CAST(frame_idx // 5 AS INT) AS sample_idx,
           |       CAST(frame_idx AS INT) AS frame_idx,
           |       frame_idx * 40 AS ts_ms
           |FROM f, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx)
           |ORDER BY doc_id, sample_idx""".stripMargin),
  )

  def all: Seq[Q] = Seq(metadata, decode, resize, frameSample)
}
