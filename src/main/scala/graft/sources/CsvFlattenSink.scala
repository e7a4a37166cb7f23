package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** CSV export honoring the dataset's `flattenPaths` hints — the one
  * reference artifact beyond the operator surface
  * (building-inspector.dataset.json:35-45): a list of JSONPath
  * expressions naming which nested `data` fields a tabular (CSV)
  * consumer wants as flat columns.
  *
  * Semantics modeled from the hint list itself:
  *   - `$.data.field`      → the struct field, native-typed
  *   - `$.data.arr[i]`     → the i-th element (0-based hint → 1-based
  *                           `element_at`), null when absent
  *   - `$.data.arr`        → the whole array, comma-joined (the only
  *                           CSV-representable rendering)
  *   - a path whose field does not exist in the record schema (the
  *     dataset lists `$.data.uuid`; the pipeline never emits `uuid`)
  *     → a typed all-null string column, so the declared CSV header
  *     is stable even when a hinted field is absent upstream.
  *
  * Column names derive from the path: drop `$.`, `.`/`[i]` → `_`,
  * lowercased (`$.data.colors[0]` → `data_colors_0`) — deterministic
  * and engine-agnostic, so the DuckDB oracle can alias identically.
  *
  * Everything is a zero-shuffle projection; the CSV rendering in
  * [[lines]] is one codegen'd concat per row.
  */
object CsvFlattenSink {

  /** The building-inspector dataset's own hint list (dataset.json:35-45). */
  val BuildingInspectorPaths: Seq[String] = Seq(
    "$.data.uuid",
    "$.data.sheetId",
    "$.data.layerId",
    "$.data.mapId",
    "$.data.colors[0]",
    "$.data.colors[1]",
    "$.data.colors",
    "$.data.borough",
    "$.data.number",
  )

  /** `$.a.b[0]` → steps `Seq(("a", None), ("b", Some(0)))`. */
  private[sources] def parsePath(path: String): Seq[(String, Option[Int])] = {
    require(path.startsWith("$."), s"flattenPaths must start with '$$.': $path")
    path.drop(2).split('.').toSeq.map { seg =>
      val i = seg.indexOf('[')
      if (i < 0) (seg, None)
      else {
        require(seg.endsWith("]"), s"malformed index segment '$seg' in $path")
        (seg.substring(0, i), Some(seg.substring(i + 1, seg.length - 1).toInt))
      }
    }
  }

  /** Deterministic CSV column name for a path. */
  def columnName(path: String): String =
    parsePath(path)
      .map { case (f, idx) => f + idx.fold("")("_" + _) }
      .mkString("_")
      .toLowerCase

  /** Resolve one path against the record schema: the native-typed
    * column, or a typed null when any step is missing from the schema.
    */
  private def resolve(schema: StructType, path: String): Column = {
    val resolved = parsePath(path).foldLeft(Option((null: Column, schema: org.apache.spark.sql.types.DataType))) {
      case (Some((c, st: StructType)), (field, idx)) if st.fieldNames.contains(field) =>
        val fieldCol = if (c == null) col(field) else c.getField(field)
        (st(field).dataType, idx) match {
          case (dt, None) => Some((fieldCol, dt))
          // try_element_at: an out-of-range hint (colors[1] on a
          // 1-color building) is an empty cell, not an ANSI error
          case (at: ArrayType, Some(i)) => Some((try_element_at(fieldCol, lit(i + 1)), at.elementType))
          case _ => None
        }
      case _ => None
    }
    resolved match {
      case Some((c, _: ArrayType)) => array_join(c, ",")
      case Some((c, _)) if c != null => c
      case _ => lit(null).cast("string")
    }
  }

  /** Flat projection: the object identity columns plus one
    * native-typed column per flatten path.
    */
  def flatten(records: DataFrame, paths: Seq[String]): DataFrame = {
    val schema = records.schema
    records.select(
      Seq(col("id"), col("otype").as("obj_type"), col("name"),
        col("valid_since"), col("valid_until")) ++
        paths.map(p => resolve(schema, p).as(columnName(p))): _*
    )
  }

  /** RFC-4180 CSV rendering of the flattened frame: every column cast
    * to string; a cell is quoted iff it contains `,`, `"`, or a
    * newline; embedded quotes double. Nulls render empty.
    */
  def lines(flat: DataFrame): DataFrame = {
    def cell(name: String): Column = {
      val s = coalesce(col(name).cast("string"), lit(""))
      when(s.rlike("[\",\n]"),
        concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))
        .otherwise(s)
    }
    flat.select(
      concat_ws(",", flat.columns.map(cell).toIndexedSeq: _*).as("value"))
  }

  /** The header line matching [[lines]]' column order. */
  def header(flat: DataFrame): String = flat.columns.mkString(",")
}
