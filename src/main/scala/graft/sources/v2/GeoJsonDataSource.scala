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
  * → rows (path, ingest_order, feature_json). Each file is one input
  * partition; within a file the reader STREAM-parses the top-level
  * `features` array with Jackson's incremental parser — the engine
  * twin of the reference's `JSONStream.parse('features.*')`
  * (building-inspector.js:327-331): memory stays bounded by one
  * feature, not the document, so a multi-GB FeatureCollection file
  * scans without multiLine JSON's whole-document buffering.
  * `ingest_order` is the feature's index in its file, preserving the
  * reference's first-seen dedup order. Downstream applies `from_json`
  * with the typed schemas (graft.sources.GeoJson).
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
    new GeoJsonTable(paths)
  }
}

object GeoJsonDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("ingest_order", LongType, nullable = false),
    StructField("feature_json", StringType, nullable = false),
  ))
}

private[v2] class GeoJsonTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"geojson(${paths.mkString(",")})"
  override def schema(): StructType = GeoJsonDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = GeoJsonDataSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        paths.map(p => GeoJsonInputPartition(p): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GeoJsonReaderFactory
    }
}

private[v2] case class GeoJsonInputPartition(path: String) extends InputPartition

private[v2] class GeoJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonPartitionReader(partition.asInstanceOf[GeoJsonInputPartition].path)
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
