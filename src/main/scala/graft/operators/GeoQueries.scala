package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.exprs._
import graft.model.Tables

/** The spatial/hash-id operator rows of SURVEY.md §2 (J3, F3, F4, P3,
  * D2) exercised over the synthetic tables so the DuckDB oracle can
  * check them: geometry is synthesized deterministically from numeric
  * columns (suppliers → axis-aligned rectangles, customers → points),
  * which makes exact `st_contains` equal to arithmetic bbox checks the
  * oracle can evaluate (SURVEY §5.4).
  */
object GeoQueries {

  // J3 — point-in-polygon join, equi on a layer key + containment.
  // Suppliers become rectangles on layer s_nationkey; customers become
  // points on layer c_nationkey. Same physical shape as the reference
  // join (geo-indices.js:38-50): broadcast polygons, equi-key + bbox +
  // exact residual.
  private val j3Spatial = Q(
    "j3_spatial_point_in_polygon",
    (s, d) => {
      import s.implicits._
      val polys = Tables.supplier(s, d).select(
        $"s_suppkey",
        $"s_nationkey".as("p_layer"),
        ($"s_suppkey" % 97).cast("double").as("x0"),
        (($"s_suppkey" % 89) + 1).cast("double").as("y0"),
        (($"s_suppkey" % 97) + 1 + ($"s_suppkey" % 5)).cast("double").as("x1"),
        (($"s_suppkey" % 89) + 3 + ($"s_suppkey" % 7)).cast("double").as("y1"),
      ).select(
        $"s_suppkey", $"p_layer", $"x0", $"y0", $"x1", $"y1",
        array(
          array($"x0", $"y0"), array($"x1", $"y0"), array($"x1", $"y1"),
          array($"x0", $"y1"), array($"x0", $"y0"),
        ).as("ring"),
      ).select(
        $"s_suppkey", $"p_layer", $"x0", $"y0", $"x1", $"y1",
        array($"ring").as("rings"),
      )
      val points = Tables.customer(s, d).select(
        $"c_custkey",
        $"c_nationkey".as("c_layer"),
        (($"c_custkey" % 95) + 1).cast("double").as("px"),
        (($"c_custkey" % 87) + 2).cast("double").as("py"),
      )
      points
        .join(
          broadcast(polys),
          $"c_layer" === $"p_layer" &&
            $"px" >= $"x0" && $"px" <= $"x1" &&
            $"py" >= $"y0" && $"py" <= $"y1" &&
            st_contains($"rings", array($"px", $"py")),
        )
        .select($"c_custkey", $"s_suppkey")
        .orderBy($"c_custkey", $"s_suppkey")
    },
    Some("""SELECT c_custkey, s_suppkey
           |FROM (SELECT c_custkey, c_nationkey,
           |             CAST(c_custkey % 95 + 1 AS DOUBLE) AS px,
           |             CAST(c_custkey % 87 + 2 AS DOUBLE) AS py
           |      FROM customer) pts
           |JOIN (SELECT s_suppkey, s_nationkey,
           |             CAST(s_suppkey % 97 AS DOUBLE) AS x0,
           |             CAST(s_suppkey % 89 + 1 AS DOUBLE) AS y0,
           |             CAST(s_suppkey % 97 + 1 + s_suppkey % 5 AS DOUBLE) AS x1,
           |             CAST(s_suppkey % 89 + 3 + s_suppkey % 7 AS DOUBLE) AS y1
           |      FROM supplier) polys
           |  ON c_nationkey = s_nationkey
           | AND px >= x0 AND px <= x1 AND py >= y0 AND py <= y1
           |ORDER BY c_custkey, s_suppkey""".stripMargin),
  )

  // J3 side-outputs — the reference's 3-way outcome (match / no-match
  // log / no-index error, building-inspector.js:287-313) over the same
  // synthetic geometry.
  private val j3Outcomes = Q(
    "j3_spatial_outcomes",
    (s, d) => {
      import s.implicits._
      val polys = Tables.supplier(s, d)
        .filter($"s_nationkey" < 20) // leave layers >= 20 unindexed
        .select(
          $"s_nationkey".as("p_layer"),
          ($"s_suppkey" % 97).cast("double").as("x0"),
          (($"s_suppkey" % 89) + 1).cast("double").as("y0"),
          (($"s_suppkey" % 97) + 1 + ($"s_suppkey" % 5)).cast("double").as("x1"),
          (($"s_suppkey" % 89) + 3 + ($"s_suppkey" % 7)).cast("double").as("y1"),
        )
      val points = Tables.customer(s, d).select(
        $"c_custkey",
        $"c_nationkey".as("c_layer"),
        (($"c_custkey" % 95) + 1).cast("double").as("px"),
        (($"c_custkey" % 87) + 2).cast("double").as("py"),
      )
      val layersWithIndex = polys.select($"p_layer").distinct()
      val flagged = points
        .join(broadcast(layersWithIndex), $"c_layer" === $"p_layer", "left_outer")
        .withColumn("has_index", $"p_layer".isNotNull)
        .drop("p_layer")
      val joined = flagged
        .filter($"has_index")
        .join(
          broadcast(polys),
          $"c_layer" === $"p_layer" &&
            $"px" >= $"x0" && $"px" <= $"x1" &&
            $"py" >= $"y0" && $"py" <= $"y1",
          "left_outer",
        )
        .groupBy($"c_custkey")
        .agg(count($"p_layer").as("n_matches"))
      val outcome = joined.select(
        $"c_custkey",
        when($"n_matches" > 0, lit("match")).otherwise(lit("no_match")).as("outcome"),
        $"n_matches",
      )
      val noIndex = flagged
        .filter(!$"has_index")
        .select($"c_custkey", lit("no_index").as("outcome"), lit(0L).as("n_matches"))
      outcome.unionByName(noIndex).orderBy($"c_custkey")
    },
    Some("""WITH pts AS (
           |  SELECT c_custkey, c_nationkey,
           |         CAST(c_custkey % 95 + 1 AS DOUBLE) AS px,
           |         CAST(c_custkey % 87 + 2 AS DOUBLE) AS py
           |  FROM customer),
           |polys AS (
           |  SELECT s_nationkey,
           |         CAST(s_suppkey % 97 AS DOUBLE) AS x0,
           |         CAST(s_suppkey % 89 + 1 AS DOUBLE) AS y0,
           |         CAST(s_suppkey % 97 + 1 + s_suppkey % 5 AS DOUBLE) AS x1,
           |         CAST(s_suppkey % 89 + 3 + s_suppkey % 7 AS DOUBLE) AS y1
           |  FROM supplier WHERE s_nationkey < 20)
           |SELECT c_custkey, outcome, n_matches FROM (
           |  SELECT p.c_custkey,
           |         CASE WHEN count(polys.s_nationkey) > 0 THEN 'match'
           |              ELSE 'no_match' END AS outcome,
           |         count(polys.s_nationkey) AS n_matches
           |  FROM pts p
           |  JOIN (SELECT DISTINCT s_nationkey FROM polys) idx
           |    ON p.c_nationkey = idx.s_nationkey
           |  LEFT JOIN polys
           |    ON p.c_nationkey = polys.s_nationkey
           |   AND px >= x0 AND px <= x1 AND py >= y0 AND py <= y1
           |  GROUP BY p.c_custkey
           |  UNION ALL
           |  SELECT c_custkey, 'no_index' AS outcome, 0 AS n_matches
           |  FROM pts WHERE c_nationkey NOT IN (SELECT s_nationkey FROM polys))
           |ORDER BY c_custkey""".stripMargin),
  )

  // F3 — md5 over a JS-joined coordinate key. Integer-valued doubles
  // make the JS formatting reproducible in ANSI SQL.
  private val f3Md5Key = Q(
    "f3_md5_coord_key",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .select(
          $"c_custkey",
          md5(js_coord_join(array(
            ($"c_custkey" % 95).cast("double"),
            ($"c_custkey" % 87).cast("double"),
          ))).as("coord_md5"),
        )
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey,
           |       md5(CAST(c_custkey % 95 AS BIGINT) || ',' ||
           |           CAST(c_custkey % 87 AS BIGINT)) AS coord_md5
           |FROM customer
           |ORDER BY c_custkey""".stripMargin),
  )

  // F4 — base62 of (the first 48 bits of) an md5. The truncation keeps
  // the value inside BIGINT so the oracle can re-derive it in pure SQL.
  private val f4Base62 = Q(
    "f4_base62_hash_id",
    (s, d) => {
      import s.implicits._
      Tables.nation(s, d)
        .select(
          $"n_nationkey",
          base62_encode_hex(substring(md5($"n_name"), 1, 12)).as("id62"),
        )
        .orderBy($"n_nationkey")
    },
    Some("""WITH RECURSIVE src AS (
           |  SELECT n_nationkey,
           |         CAST('0x' || substr(md5(n_name), 1, 12) AS BIGINT) AS n
           |  FROM nation),
           |alpha(a) AS (
           |  SELECT '0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'),
           |conv AS (
           |  SELECT n_nationkey, n AS remaining, '' AS acc FROM src
           |  UNION ALL
           |  SELECT c.n_nationkey, c.remaining // 62,
           |         substr(alpha.a, CAST(c.remaining % 62 AS INT) + 1, 1) || c.acc
           |  FROM conv c, alpha WHERE c.remaining > 0)
           |SELECT s.n_nationkey,
           |       CASE WHEN s.n = 0 THEN '0' ELSE c.acc END AS id62
           |FROM src s JOIN conv c
           |  ON s.n_nationkey = c.n_nationkey AND c.remaining = 0
           |ORDER BY s.n_nationkey""".stripMargin),
  )

  // P3/D2 — synthetic hash id + first-seen dedup on it
  // (building-inspector.js:206-214) over events.
  private val d2DedupHashId = Q(
    "d2_dedup_hash_id",
    (s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"hash_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select(
          $"event_id", $"ts", $"user_id", $"event_type",
          concat(lit("ev-"), $"user_id", lit("-"),
            md5(concat_ws(",", $"user_id", $"event_type"))).as("hash_id"),
        )
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"hash_id", $"event_id")
        .orderBy($"hash_id")
    },
    Some("""SELECT hash_id, event_id FROM (
           |  SELECT 'ev-' || user_id || '-' ||
           |         md5(user_id || ',' || event_type) AS hash_id,
           |         event_id,
           |         row_number() OVER (
           |           PARTITION BY 'ev-' || user_id || '-' ||
           |                        md5(user_id || ',' || event_type)
           |           ORDER BY ts, event_id) AS rn
           |  FROM events)
           |WHERE rn = 1
           |ORDER BY hash_id""".stripMargin),
  )

  // The spark.sql surface: same spatial join expressed as SQL text
  // over registered temp views, using the engine's registered
  // st_contains function (SURVEY §3.4 — the engine exposes spark.sql
  // over temp views as a first-class entry point).
  private val sqlSurface = Q(
    "sql_surface_spatial",
    (s, d) => {
      graft.functions.exprs.register(s)
      Tables.customer(s, d).createOrReplaceTempView("graft_customer")
      Tables.supplier(s, d).createOrReplaceTempView("graft_supplier")
      s.sql("""
        WITH pts AS (
          SELECT c_custkey, c_nationkey,
                 CAST(c_custkey % 95 + 1 AS DOUBLE) AS px,
                 CAST(c_custkey % 87 + 2 AS DOUBLE) AS py
          FROM graft_customer),
        polys AS (
          SELECT s_suppkey, s_nationkey,
                 CAST(s_suppkey % 97 AS DOUBLE) AS x0,
                 CAST(s_suppkey % 89 + 1 AS DOUBLE) AS y0,
                 CAST(s_suppkey % 97 + 1 + s_suppkey % 5 AS DOUBLE) AS x1,
                 CAST(s_suppkey % 89 + 3 + s_suppkey % 7 AS DOUBLE) AS y1
          FROM graft_supplier)
        SELECT c_custkey, s_suppkey
        FROM pts JOIN polys
          ON c_nationkey = s_nationkey
         AND px >= x0 AND px <= x1 AND py >= y0 AND py <= y1
         AND st_contains(
               array(array(array(x0, y0), array(x1, y0), array(x1, y1),
                           array(x0, y1), array(x0, y0))),
               array(px, py))
        ORDER BY c_custkey, s_suppkey""")
    },
    j3Spatial.oracle, // same result as the DataFrame-API spatial join
  )

  def all: Seq[Q] =
    Seq(j3Spatial, j3Outcomes, f3Md5Key, f4Base62, d2DedupHashId, sqlSurface)
}
