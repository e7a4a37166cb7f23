package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 streaming GeoJSON source must yield the same features, in
  * the same ingest order, as the multiLine whole-document reader.
  */
class GeoJsonV2Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("v2 source matches the multiLine reader on the fixture, in order") {
    val path = getClass.getResource("/inspector/consolidated.geojson").getPath
    val v2 = spark.read.format("geojson").load(path)
      .select(col("ingest_order"),
        from_json(col("feature_json"), GeoJson.consolidatedFeatureSchema).as("feature"))
    val classic = GeoJson.consolidated(spark, path)

    val v2Rows = v2.orderBy("ingest_order")
      .selectExpr("ingest_order", "feature.properties.id", "feature.properties.sheet_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val classicRows = classic.orderBy("ingest_order")
      .selectExpr("CAST(ingest_order AS LONG)", "feature.properties.id", "feature.properties.sheet_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(v2Rows.nonEmpty && v2Rows.sameElements(classicRows))

    // one partition per file
    assert(v2.rdd.getNumPartitions == 1)
    val both = spark.read.format("geojson").load(s"$path,$path")
    assert(both.rdd.getNumPartitions == 2)
    assert(both.count() == 2 * v2Rows.length)
  }
}
