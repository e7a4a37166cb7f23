package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.exprs._
import graft.sources.GeoJson

/** The reference's `transform` step re-expressed as one declarative
  * Spark plan (SURVEY.md §3): consolidated buildings phase + toponym
  * phase with the per-layer spatial join.
  *
  * Every output record lands in ONE superset-schema DataFrame
  * ([[InspectorPipeline.recordSchema]]) tagged by `rtype`
  * ('object' | 'relation' | 'log'), mirroring the reference's tagged
  * union (building-inspector.js:108-136). The NDJSON sink serializes
  * it; tests canonicalize and compare.
  *
  * Scale design: the two dimension tables (sheets, layer-boroughs) are
  * broadcast; the building fact stream is shuffled once by building id
  * for first-seen dedup and then flows through narrow projections;
  * the spatial join is an equi-join on layerId with a bbox prefilter
  * and the exact `st_contains` as residual — the layerId key gives the
  * same pruning the reference's per-layer R-tree does
  * (geo-indices.js:22-56), and skewed layers are handled by AQE.
  */
object InspectorPipeline {

  /** Intermediate per-building-phase result: emitted records plus the
    * polygon "index" side reused by the toponym phase (the reference's
    * build→probe barrier, building-inspector.js:404-409, realized as a
    * reused DataFrame).
    */
  final case class ConsolidatedOut(records: DataFrame, indexedBuildings: DataFrame)

  // ---------------------------------------------------------------- dims

  /** sheetsById: last-wins keyBy on properties.id (D3,
    * building-inspector.js:384-386).
    */
  def sheetsDim(sheets: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("s_sheet_id")).orderBy(col("s_order").desc)
    sheets
      .select(
        col("feature.properties.id").as("s_sheet_id"),
        col("feature.properties.map_id").as("sheet_map_id"),
        col("feature.properties.layer.external_id").as("layer_id"),
        col("feature.properties.layer.year").cast("int").as("year"),
        col("ingest_order").as("s_order"),
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "s_order")
  }

  /** layersById: id → borough (building-inspector.js:388-392). */
  def layersDim(layerBoroughs: DataFrame): DataFrame =
    layerBoroughs.select(col("id").as("lb_layer_id"), col("borough"))

  /** H4 fail-fast (J1): the reference dereferences
    * `sheetsById[feature.properties.sheet_id]` unconditionally
    * (building-inspector.js:103-104) and `stopOnError` aborts the whole
    * run on the resulting TypeError (:268,322). A silent inner join
    * would instead drop such features, so before joining we assert —
    * on the DEDUPED set, because a later duplicate is never
    * dereferenced by the reference — that every referenced sheet
    * exists, and abort with the offending ids.
    *
    * Cost: the deduped set is localCheckpoint-ed by the callers, so
    * this adds one narrow scan of the materialized partitions (just
    * sheet_id) plus the broadcast anti-join — NOT a second dedup
    * shuffle. The check is an eager pre-flight action, mirroring the
    * reference's fail-before-emit contract.
    */
  private def assertSheetsPresent(
      deduped: DataFrame, sheetsD: DataFrame, what: String): Unit = {
    val missing = deduped
      .select(col("sheet_id"))
      .join(broadcast(sheetsD.select(col("s_sheet_id"))),
        col("sheet_id") === col("s_sheet_id"), "left_anti")
      .distinct()
      .orderBy(col("sheet_id")) // stable sample → reproducible abort message
      .limit(20)
      .collect()
      .map(_.get(0))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"$what references missing sheet id(s): ${missing.mkString(", ")} " +
          "(reference aborts: building-inspector.js:103-104 + stopOnError)")
  }

  // ------------------------------------------------------- consolidated

  def consolidated(
      spark: SparkSession,
      features: DataFrame,
      sheets: DataFrame,
      layers: DataFrame): ConsolidatedOut = {

    val feats = features.select(
      col("ingest_order"),
      col("feature.properties.id").as("building_id"),
      col("feature.properties.sheet_id").as("sheet_id"),
      // F1: parseInt(map_id) (building-inspector.js:102)
      col("feature.properties.map_id").cast("int").as("map_id"),
      col("feature.properties.consensus_color").as("consensus_color"),
      col("feature.properties.consensus_address").as("address_raw"),
      try_element_at(col("feature.geometry.geometries"), lit(1)).as("geom0"),
      col("feature.geometry.geometries").as("geometries"),
    )

    // D1: first-seen dedup by building id, BEFORE the degenerate-ring
    // filter — a duplicate whose first occurrence is degenerate must
    // stay suppressed (H2; building-inspector.js:92-100 vs :138-140).
    // localCheckpoint: the H4 pre-flight assert below is an eager
    // action over this set; materializing it once means the assert and
    // the main join share one dedup shuffle instead of running the
    // wide window twice.
    val dedupW = Window.partitionBy(col("building_id")).orderBy(col("ingest_order"))
    val deduped = feats
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .drop("rn")
      .localCheckpoint()

    // J1 (inner, fail-fast semantics) + J2 (left outer).
    val sheetsD = sheetsDim(sheets)
    assertSheetsPresent(deduped, sheetsD, "consolidated")
    val joined = deduped
      .join(broadcast(sheetsD), col("sheet_id") === col("s_sheet_id"))
      .join(broadcast(layersDim(layers)), col("layer_id") === col("lb_layer_id"), "left_outer")
      .withColumn("rings", GeoJson.polygonRings(col("geom0.coordinates")))

    // F6: drop everything (object, relations, log, addresses) when the
    // polygon's outer ring has < 4 points (building-inspector.js:138-140).
    // JS quirk preserved: a non-Polygon geometries[0] (coordinates[0]
    // is a number; undefined < 4 === false) is NOT dropped.
    // Fans out into 4 derived record branches + the spatial index
    // side. persist (lazy, columnar cache) rather than an eager
    // localCheckpoint: the wide rows (raw geometry text + ring arrays)
    // compute once under the single driving action either way, but the
    // checkpoint's extra blocking job + row serialization measurably
    // slows the composed pipeline (4.8 s vs 2.5 s at sf0.1). The plan
    // auditor dedupes the cached subtree when counting exchanges, so
    // the cache's re-rendered plan text no longer inflates the audit.
    val ok = joined
      .filter(col("rings").isNull || size(try_element_at(col("rings"), lit(1))) >= 4)
      .persist()

    // P1: building object (building-inspector.js:108-125).
    val buildingObjects = ok.select(Seq(
      lit("object").as("rtype"),
      col("building_id").as("id"),
      lit("st:Building").as("otype"),
      col("year").as("valid_since"),
      col("year").as("valid_until"),
      lit(null.asInstanceOf[String]).as("name"),
      dataStruct(
        number = lit(null.asInstanceOf[String]),
        sheetId = col("sheet_id"),
        layerId = col("layer_id"),
        mapId = col("map_id"),
        // F2: truthiness guard — '' and null both mean absent
        colors = when(length(col("consensus_color")) > 0, split(col("consensus_color"), ",")),
        borough = col("borough"),
      ).as("data"),
      rawGeometryJson(col("geom0")).as("geometry_json"),
    ) ++ nullRel: _*)

    // P4: 2 mapwarper edges per building (building-inspector.js:126,183-202).
    val mapwarperRels = mapwarperRelations(ok, col("building_id"), col("map_id"), col("layer_id"))

    // S8/J2 side-output: borough log (falsy check, building-inspector.js:129-136).
    val boroughLogs = logRecords(
      ok.filter(col("borough").isNull || col("borough") === ""),
      concat(lit("Can't find borough for layer "), col("layer_id")),
    )

    // G1/P2/P5: positional address explode (building-inspector.js:142-177).
    val exploded = ok
      .filter(col("address_raw").isNotNull && col("address_raw") =!= "NONE")
      .select(
        col("building_id"), col("sheet_id"), col("layer_id"), col("map_id"),
        col("year"), col("borough"), col("geometries"),
        posexplode(from_json(col("address_raw"),
          ArrayType(StructType(Seq(StructField("flag_value", StringType))))))
          .as(Seq("pos", "address")),
      )
    val addressObjects = exploded.select(Seq(
      lit("object").as("rtype"),
      concat(col("building_id"), lit("-"), col("pos") + 1).as("id"),
      lit("st:Address").as("otype"),
      col("year").as("valid_since"),
      col("year").as("valid_until"),
      col("address.flag_value").as("name"),
      dataStruct(
        number = col("address.flag_value"),
        sheetId = col("sheet_id"),
        layerId = col("layer_id"),
        mapId = col("map_id"),
        colors = lit(null).cast(ArrayType(StringType)),
        borough = col("borough"),
      ).as("data"),
      // geometry = geometries[i + 1]; absent → omitted (js :162)
      rawGeometryJson(try_element_at(col("geometries"), col("pos") + 2)).as("geometry_json"),
    ) ++ nullRel: _*)
    val addressRels = relationRecords(
      exploded,
      concat(col("building_id"), lit("-"), col("pos") + 1),
      col("building_id"),
      lit("st:in"),
    )

    // Spatial index side: only st:Building objects with Polygon
    // geometry are indexed (geo-indices.js:14-16, 25-36).
    val indexed = ok
      .filter(col("geom0.type") === "Polygon" && col("rings").isNotNull)
      .select(
        col("layer_id").as("b_layer_id"),
        col("building_id").as("b_id"),
        col("rings").as("b_rings"),
        array_min(transform(try_element_at(col("rings"), lit(1)), p => element_at(p, 1))).as("b_xmin"),
        array_max(transform(try_element_at(col("rings"), lit(1)), p => element_at(p, 1))).as("b_xmax"),
        array_min(transform(try_element_at(col("rings"), lit(1)), p => element_at(p, 2))).as("b_ymin"),
        array_max(transform(try_element_at(col("rings"), lit(1)), p => element_at(p, 2))).as("b_ymax"),
      )

    val records = buildingObjects
      .unionByName(mapwarperRels)
      .unionByName(boroughLogs)
      .unionByName(addressObjects)
      .unionByName(addressRels)
    ConsolidatedOut(records, indexed)
  }

  // ------------------------------------------------------------ toponyms

  def toponyms(
      spark: SparkSession,
      features: DataFrame,
      sheets: DataFrame,
      layers: DataFrame,
      indexedBuildings: DataFrame): DataFrame = {

    val base = features.select(
      col("ingest_order"),
      col("feature.properties.sheet_id").as("sheet_id"),
      col("feature.properties.consensus").as("consensus"),
      col("feature.geometry").as("geometry"),
      GeoJson.pointCoords(col("feature.geometry.coordinates")).as("coords"),
    )

    // P3/F3/F4: toponym-{sheetId}-{base62(md5(coords.join(',')))}
    // (building-inspector.js:206-209). The join runs on the RAW
    // coordinates subtree with JS recursive-flatten semantics: the
    // reference derives the id for EVERY toponym before the Point
    // gate, so a Polygon toponym's id comes from its flattened ring
    // coordinates, not from a null Point parse.
    val withId = base.withColumn(
      "toponym_id",
      concat(lit("toponym-"), col("sheet_id"), lit("-"),
        base62_encode_hex(md5(js_coord_join_raw(col("geometry.coordinates"))))),
    )

    // D2: first-seen dedup by synthetic id (building-inspector.js:211-214).
    // localCheckpoint for the same reason as the consolidated phase:
    // one dedup shuffle shared by the H4 assert and the sheet join.
    val dedupW = Window.partitionBy(col("toponym_id")).orderBy(col("ingest_order"))
    val deduped = withId
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .drop("rn")
      .localCheckpoint()

    // J1 + J2; toponym mapId comes from the SHEET's map_id
    // (building-inspector.js:218), unlike buildings.
    val sheetsD = sheetsDim(sheets)
    assertSheetsPresent(deduped, sheetsD, "toponyms")
    val joined = deduped
      .join(broadcast(sheetsD), col("sheet_id") === col("s_sheet_id"))
      .join(broadcast(layersDim(layers)), col("layer_id") === col("lb_layer_id"), "left_outer")
      .withColumn("map_id", col("sheet_map_id").cast("int"))
      .persist() // fans out into 3 record branches + probes (see `ok`)

    val toponymObjects = joined.select(Seq(
      lit("object").as("rtype"),
      col("toponym_id").as("id"),
      lit("st:Building").as("otype"),
      col("year").as("valid_since"),
      col("year").as("valid_until"),
      col("consensus").as("name"),
      dataStruct(
        number = lit(null.asInstanceOf[String]),
        sheetId = col("sheet_id"),
        layerId = col("layer_id"),
        mapId = col("map_id"),
        colors = lit(null).cast(ArrayType(StringType)),
        borough = col("borough"),
      ).as("data"),
      rawGeometryJson(col("geometry")).as("geometry_json"),
    ) ++ nullRel: _*)

    val mapwarperRels = mapwarperRelations(joined, col("toponym_id"), col("map_id"), col("layer_id"))

    val boroughLogs = logRecords(
      joined.filter(col("borough").isNull || col("borough") === ""),
      concat(lit("Can't find borough for layer "), col("layer_id")),
    )

    // J3: per-layer point-in-polygon probe, Points only
    // (geo-indices.js:18-20,38-50; building-inspector.js:280-313).
    val probes = joined
      .filter(col("geometry.type") === "Point" && col("coords").isNotNull)
      .select(
        col("toponym_id"), col("layer_id"),
        element_at(col("coords"), 1).as("px"),
        element_at(col("coords"), 2).as("py"),
        col("coords"),
      )

    // "No geospatial index for layer" = the toponym's layer has no
    // indexed polygons at all (geo-indices.js:44-46) → error log.
    val layersWithIndex = indexedBuildings.select(col("b_layer_id")).distinct()
    val flagged = probes
      .join(broadcast(layersWithIndex), col("layer_id") === col("b_layer_id"), "left_outer")
      .withColumn("has_index", col("b_layer_id").isNotNull)
      .drop("b_layer_id")

    val noIndexLogs = logRecords(
      flagged.filter(!col("has_index")),
      concat(lit("Error computing intersection for toponym "), col("toponym_id")),
    )

    // Equi-join on layerId + bbox prefilter, exact contains as residual.
    val spatial = flagged
      .filter(col("has_index"))
      .join(
        indexedBuildings,
        col("layer_id") === col("b_layer_id") &&
          col("px") >= col("b_xmin") && col("px") <= col("b_xmax") &&
          col("py") >= col("b_ymin") && col("py") <= col("b_ymax") &&
          st_contains(col("b_rings"), col("coords")),
        "left_outer",
      )

    val sameAsRels = relationRecords(
      spatial.filter(col("b_id").isNotNull),
      col("toponym_id"),
      col("b_id"),
      lit("st:sameAs"),
    )
    val noMatchLogs = logRecords(
      spatial.filter(col("b_id").isNull),
      concat(lit("Can't find building for toponym "), col("toponym_id")),
    )

    toponymObjects
      .unionByName(mapwarperRels)
      .unionByName(boroughLogs)
      .unionByName(sameAsRels)
      .unionByName(noMatchLogs)
      .unionByName(noIndexLogs)
  }

  // ----------------------------------------------------------- helpers

  /** Superset `data` payload; to_json omits nulls, matching how JS
    * `undefined` fields vanish from the reference's NDJSON.
    */
  private def dataStruct(number: Column, sheetId: Column, layerId: Column,
      mapId: Column, colors: Column, borough: Column): Column =
    struct(
      number.as("number"),
      sheetId.as("sheetId"),
      layerId.as("layerId"),
      mapId.as("mapId"),
      colors.as("colors"),
      borough.as("borough"),
    )

  /** Rebuild the raw GeoJSON text of a captured geometry struct
    * (type + raw coordinates subtree).
    */
  private def rawGeometryJson(geom: Column): Column =
    when(geom.isNotNull && geom.getField("coordinates").isNotNull,
      concat(lit("{\"type\":\""), geom.getField("type"),
        lit("\",\"coordinates\":"), geom.getField("coordinates"), lit("}")))

  private val relColumns = Seq("rel_from", "rel_to", "rel_type", "error")

  private def nullRel: Seq[Column] =
    relColumns.map(n => lit(null.asInstanceOf[String]).as(n))

  private def objNulls: Seq[Column] = Seq(
    lit(null.asInstanceOf[String]).as("id"),
    lit(null.asInstanceOf[String]).as("otype"),
    lit(null).cast("int").as("valid_since"),
    lit(null).cast("int").as("valid_until"),
    lit(null.asInstanceOf[String]).as("name"),
    lit(null).cast(
      "struct<number:string,sheetId:bigint,layerId:bigint,mapId:int," +
        "colors:array<string>,borough:string>").as("data"),
    lit(null.asInstanceOf[String]).as("geometry_json"),
  )

  def relationRecords(df: DataFrame, from: Column, to: Column, rtype: Column): DataFrame =
    df.select(
      Seq(lit("relation").as("rtype")) ++ objNulls ++ Seq(
        from.cast("string").as("rel_from"),
        to.cast("string").as("rel_to"),
        rtype.as("rel_type"),
        lit(null.asInstanceOf[String]).as("error"),
      ): _*
    )

  def logRecords(df: DataFrame, error: Column): DataFrame =
    df.select(
      Seq(lit("log").as("rtype")) ++ objNulls ++ Seq(
        lit(null.asInstanceOf[String]).as("rel_from"),
        lit(null.asInstanceOf[String]).as("rel_to"),
        lit(null.asInstanceOf[String]).as("rel_type"),
        error.as("error"),
      ): _*
    )

  /** 2 edges per object: mapwarper/{mapId} and mapwarper/layer-{layerId}
    * (building-inspector.js:183-202).
    */
  private def mapwarperRelations(df: DataFrame, id: Column, mapId: Column,
      layerId: Column): DataFrame = {
    val edges = df.select(
      id.cast("string").as("rel_from"),
      explode(array(
        concat(lit("mapwarper/"), mapId),
        concat(lit("mapwarper/layer-"), layerId),
      )).as("rel_to"),
    )
    relationRecords(edges, col("rel_from"), col("rel_to"), lit("st:in"))
  }
}
