package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 GeoJSON FeatureCollection source:
  *
  *   spark.read.format("geojson").load("a.geojson,b.geojson")
  *
  * → rows (path, ingest_order, feature_json). Within a file the reader
  * STREAM-parses the `features` array with Jackson's incremental
  * parser — the engine twin of the reference's
  * `JSONStream.parse('features.*')` (building-inspector.js:327-331):
  * memory stays bounded by one feature, not the document.
  * `ingest_order` is the feature's index in its file, preserving the
  * reference's first-seen dedup order. Downstream applies `from_json`
  * with the typed schemas (graft.sources.GeoJson).
  *
  * LARGE-FILE SPLITTING: a file bigger than `chunkBytes` (default
  * 64 MiB) is planned as MULTIPLE byte-range partitions — the
  * reference's real datasets are single multi-GB FeatureCollection
  * files, exactly the input that would otherwise scan on one core.
  * Planning runs one sequential index skim over the big file
  * (Jackson `skipChildren`, no tree building — I/O-bound, the same
  * driver-side role as Parquet footer reads) recording the exact byte
  * offsets of feature boundaries every ~chunkBytes; each task then
  * parses `[` + its byte range + `]` as a standalone JSON array, so
  * the expensive per-feature work (tree building, row emission, the
  * downstream from_json) distributes across the cluster. Offsets come
  * from a real parse — there is no "re-sync on `{`" heuristic to be
  * fooled by braces inside string literals — and each split carries
  * its first feature index, keeping `ingest_order` globally exact.
  */
class GeoJsonDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "geojson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoJsonDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val paths = Option(properties.get("path")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val chunkBytes = Option(properties.get("chunkBytes"))
      .map(_.toLong).getOrElse(GeoJsonDataSource.DefaultChunkBytes)
    new GeoJsonTable(paths, chunkBytes)
  }
}

object GeoJsonDataSource {
  val DefaultChunkBytes: Long = 64L * 1024 * 1024

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("ingest_order", LongType, nullable = false),
    StructField("feature_json", StringType, nullable = false),
  ))

  /** Index skim of one big file: byte ranges of consecutive feature
    * runs, each ≈ chunkBytes, as (startByte, endByteExclusive,
    * firstFeatureIndex). Returns None when the file has no root-level
    * `features` array or a non-object element (fall back to the
    * whole-file reader, which reports the malformation the usual way).
    */
  private[v2] def indexSplits(
      path: String, chunkBytes: Long): Option[Seq[(Long, Long, Long)]] = {
    val parser = new JsonFactory().createParser(new java.io.File(path))
    try {
      var tok = parser.nextToken()
      var inFeatures = false
      while (!inFeatures && tok != null) {
        if (tok == JsonToken.FIELD_NAME && parser.currentName() == "features" &&
          parser.getParsingContext.getParent.inRoot()) {
          if (parser.nextToken() == JsonToken.START_ARRAY) inFeatures = true
        }
        if (!inFeatures) tok = parser.nextToken()
      }
      if (!inFeatures) return None
      val splits = Seq.newBuilder[(Long, Long, Long)]
      var splitStart = -1L
      var splitFirstIdx = 0L
      var lastEnd = -1L
      var idx = 0L
      var done = false
      while (!done) {
        parser.nextToken() match {
          case JsonToken.START_OBJECT =>
            val objStart = parser.currentTokenLocation().getByteOffset
            if (splitStart < 0) { splitStart = objStart; splitFirstIdx = idx }
            parser.skipChildren() // leaves END_OBJECT as current token
            lastEnd = parser.currentLocation().getByteOffset
            idx += 1
            if (lastEnd - splitStart >= chunkBytes) {
              splits += ((splitStart, lastEnd, splitFirstIdx))
              splitStart = -1L
            }
          case JsonToken.END_ARRAY => done = true
          case _ => return None // non-object feature element
        }
      }
      if (splitStart >= 0) splits += ((splitStart, lastEnd, splitFirstIdx))
      Some(splits.result())
    } finally parser.close()
  }
}

private[v2] class GeoJsonTable(paths: Seq[String], chunkBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"geojson(${paths.mkString(",")})"
  override def schema(): StructType = GeoJsonDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  /** Partitions for one file: byte-range splits above chunkBytes,
    * else the whole-file streaming parser.
    */
  private[v2] def partitionsFor(p: String): Seq[InputPartition] = {
    val size = new java.io.File(p).length()
    val ranges =
      if (size > chunkBytes) GeoJsonDataSource.indexSplits(p, chunkBytes)
      else None
    ranges match {
      case Some(rs) if rs.nonEmpty =>
        rs.map { case (s, e, i) => GeoJsonInputPartition(p, s, e, i): InputPartition }
      case _ =>
        Seq(GeoJsonInputPartition(p, -1L, -1L, 0L): InputPartition)
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = GeoJsonDataSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        paths.flatMap(partitionsFor).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GeoJsonReaderFactory
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
        require(paths.size == 1 && new java.io.File(paths.head).isDirectory,
          s"streaming geojson needs a single landing DIRECTORY to watch, got $paths")
        new GeoJsonMicroBatchStream(paths.head, GeoJsonTable.this)
      }
    }
}

/** Micro-batch stream over a landing directory of FeatureCollection
  * files — the engine twin of the reference's incremental
  * page-by-page ingest (building-inspector.js:37-64 pulls pages until
  * empty; here each landed `.geojson` file is a page). An offset is
  * the SET of files ingested so far (serialized as a sorted JSON
  * array), so a batch is exactly the newly-landed files, each planned
  * with the same byte-range splitting as the batch scan; per-file
  * `ingest_order` and the (path, ingest_order) dedup contract carry
  * over unchanged. Files must land atomically (write-then-rename, the
  * standard landing-dir discipline) — a file is picked up when listed.
  *
  * Known limit: offsets carry the complete file set, so offset JSON
  * and the per-batch set-diff grow O(files ever landed) — right for a
  * bounded backfill (any landing order, files may arrive out of name
  * order), but a months-long continuous ingest should compact the
  * offset to a high-water mark, which is only sound once landing
  * names are promised monotone (e.g. timestamped); this source makes
  * no such assumption, so it keeps the explicit set.
  */
private[v2] class GeoJsonMicroBatchStream(dir: String, table: GeoJsonTable)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val mapper = new ObjectMapper()

  private def listFiles(): Seq[String] = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) Seq.empty
    else fs.filter(f => f.isFile && f.getName.endsWith(".geojson"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  override def initialOffset(): Offset = GeoJsonOffset(Seq.empty)
  override def latestOffset(): Offset = GeoJsonOffset(listFiles())
  override def deserializeOffset(json: String): Offset =
    GeoJsonOffset(mapper.readValue(json, classOf[Array[String]]).toSeq)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GeoJsonOffset].files.toSet
    end.asInstanceOf[GeoJsonOffset].files.filterNot(seen)
      .flatMap(table.partitionsFor).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[v2] case class GeoJsonOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    new ObjectMapper().writeValueAsString(files.sorted.toArray)
}

/** start < 0 ⇒ whole file (stream from the top, locate `features`);
  * otherwise a byte range [start, end) of consecutive features.
  */
private[v2] case class GeoJsonInputPartition(
    path: String, start: Long, end: Long, firstIndex: Long) extends InputPartition

private[v2] class GeoJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GeoJsonInputPartition]
    if (p.start < 0) new GeoJsonPartitionReader(p.path)
    else new GeoJsonRangeReader(p.path, p.start, p.end, p.firstIndex)
  }
}

/** Streams one FeatureCollection file: advances to the `features`
  * array, then emits one row per element without materializing the
  * document.
  */
private[v2] class GeoJsonPartitionReader(path: String)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val parser = new JsonFactory(mapper)
    .createParser(new java.io.File(path))
  private var inFeatures = false
  private var order = -1L
  private var current: InternalRow = _
  private val pathUtf8 = UTF8String.fromString(path)

  private def advanceToFeatures(): Boolean = {
    var tok = parser.nextToken()
    while (tok != null) {
      if (tok == JsonToken.FIELD_NAME && parser.currentName() == "features" &&
        parser.getParsingContext.getParent.inRoot()) {
        if (parser.nextToken() == JsonToken.START_ARRAY) return true
      }
      tok = parser.nextToken()
    }
    false
  }

  override def next(): Boolean = {
    if (!inFeatures) {
      if (!advanceToFeatures()) return false
      inFeatures = true
    }
    val tok = parser.nextToken()
    if (tok == null || tok == JsonToken.END_ARRAY) return false
    val node = mapper.readTree[com.fasterxml.jackson.databind.JsonNode](parser)
    order += 1
    current = InternalRow(
      pathUtf8,
      order,
      UTF8String.fromString(mapper.writeValueAsString(node)))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = parser.close()
}

/** Streams one byte range of consecutive features: the range's bytes
  * bracketed as `[` + range + `]` parse as a standalone JSON array
  * (inter-feature commas inside the range stay valid), so this reader
  * is just the array-element loop of [[GeoJsonPartitionReader]] with
  * `ingest_order` offset by the split's first feature index.
  */
private[v2] class GeoJsonRangeReader(
    path: String, start: Long, end: Long, firstIndex: Long)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val fileIn = new java.io.FileInputStream(path)
  fileIn.skipNBytes(start)
  private val ranged = new java.io.SequenceInputStream(
    java.util.Collections.enumeration(java.util.Arrays.asList(
      new java.io.ByteArrayInputStream(Array[Byte]('[')),
      new BoundedInputStream(fileIn, end - start),
      new java.io.ByteArrayInputStream(Array[Byte](']')),
    )))
  private val parser = new JsonFactory(mapper).createParser(ranged)
  require(parser.nextToken() == JsonToken.START_ARRAY)
  private var order = firstIndex - 1
  private var current: InternalRow = _
  private val pathUtf8 = UTF8String.fromString(path)

  override def next(): Boolean = {
    val tok = parser.nextToken()
    if (tok == null || tok == JsonToken.END_ARRAY) return false
    val node = mapper.readTree[com.fasterxml.jackson.databind.JsonNode](parser)
    order += 1
    current = InternalRow(
      pathUtf8,
      order,
      UTF8String.fromString(mapper.writeValueAsString(node)))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = parser.close()
}

/** Caps reads at `limit` bytes; closing closes the underlying stream. */
private[v2] class BoundedInputStream(in: java.io.InputStream, limit: Long)
    extends java.io.InputStream {
  private var remaining = limit
  override def read(): Int =
    if (remaining <= 0) -1
    else { val b = in.read(); if (b >= 0) remaining -= 1; b }
  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (remaining <= 0) return -1
    val n = in.read(buf, off, math.min(len, remaining).toInt)
    if (n > 0) remaining -= n
    n
  }
  override def close(): Unit = in.close()
}
