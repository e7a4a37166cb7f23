package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables
import graft.util.Cols._

/** SURVEY.md §2 operator inventory re-expressed over the driver's
  * synthetic tables, one query per inventory row, each with a DuckDB
  * oracle. Names carry the inventory id (s4, p1, f1, d1, j1, g1, u1 …).
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame
  * plan — filters/projections reach the parquet scan, dimension joins
  * are explicitly `broadcast(...)`, aggregations are partial (map-side
  * combine) by construction, and sorts exist only to make the driver's
  * hash compare deterministic (a production caller would drop the
  * final orderBy).
  */
object RelationalQueries {

  // S4 — source scan with projection + filter pushdown
  // (reference: GeoJSON FeatureCollection scan, building-inspector.js:327-331)
  private val s4Scan = Q(
    "s4_scan_pushdown",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter(to_date($"l_shipdate") < lit("1996-01-01"))
        .select(
          $"l_orderkey",
          $"l_linenumber",
          $"l_quantity",
          to_date($"l_shipdate").as("ship_date"),
        )
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |       CAST(l_shipdate AS DATE) AS ship_date
           |FROM lineitem
           |WHERE CAST(l_shipdate AS DATE) < DATE '1996-01-01'
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
  )

  // P1 — object projection: composite typed record built from a row
  // (reference: building projection, building-inspector.js:108-127)
  private val p1Project = Q(
    "p1_project_object",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          concat(lit("order-"), $"o_orderkey").as("id"),
          lit("st:Order").as("otype"),
          year($"o_orderdate").as("valid_since"),
          year($"o_orderdate").as("valid_until"),
          $"o_orderstatus".as("status"),
          cents($"o_totalprice").as("total_cents"),
        )
        .orderBy($"id")
    },
    Some(s"""SELECT 'order-' || o_orderkey AS id,
            |       'st:Order' AS otype,
            |       CAST(year(o_orderdate) AS INT) AS valid_since,
            |       CAST(year(o_orderdate) AS INT) AS valid_until,
            |       o_orderstatus AS status,
            |       ${centsSql("o_totalprice")} AS total_cents
            |FROM orders
            |ORDER BY id""".stripMargin),
  )

  // P2 — positional child-id projection: "{parent}-{i+1}" + element_at
  // (reference: address projection, building-inspector.js:146-165)
  private val p2ChildId = Q(
    "p2_positional_child_id",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
        .select(
          concat($"p_partkey", lit("-"), $"pos" + 1).as("child_id"),
          $"p_partkey".as("parent_id"),
          element_at(split(col("word"), ""), 1).as("initial"),
        )
        .orderBy($"child_id")
    },
    Some("""SELECT p_partkey || '-' || pos AS child_id,
           |       p_partkey AS parent_id,
           |       substr(word, 1, 1) AS initial
           |FROM (
           |  SELECT p_partkey,
           |         unnest(string_split(p_name, ' ')) AS word,
           |         unnest(generate_series(1, len(string_split(p_name, ' ')))) AS pos
           |  FROM part)
           |ORDER BY child_id""".stripMargin),
  )

  // P4/P5 — relation (edge) emission: each row fans out to 2 edges
  // (reference: mapwarper relations, building-inspector.js:183-202)
  private val p4Relations = Q(
    "p4_relation_fanout",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          explode(
            array(
              struct(
                concat(lit("order-"), $"o_orderkey").as("src"),
                concat(lit("customer/"), $"o_custkey").as("dst"),
                lit("st:by").as("rtype"),
              ),
              struct(
                concat(lit("order-"), $"o_orderkey").as("src"),
                concat(lit("status/"), $"o_orderstatus").as("dst"),
                lit("st:in").as("rtype"),
              ),
            )
          ).as("rel"),
        )
        .select($"rel.src".as("src"), $"rel.dst".as("dst"), $"rel.rtype".as("rtype"))
        .orderBy($"src", $"dst", $"rtype")
    },
    Some("""SELECT src, dst, rtype FROM (
           |  SELECT 'order-' || o_orderkey AS src,
           |         'customer/' || o_custkey AS dst, 'st:by' AS rtype
           |  FROM orders
           |  UNION ALL
           |  SELECT 'order-' || o_orderkey AS src,
           |         'status/' || o_orderstatus AS dst, 'st:in' AS rtype
           |  FROM orders)
           |ORDER BY src, dst, rtype""".stripMargin),
  )

  // F1 — integer parse/cast from a string payload
  // (reference: parseInt(map_id), building-inspector.js:102,105)
  private val f1Cast = Q(
    "f1_cast_parse_int",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(
          $"event_id",
          regexp_extract($"props", "\"k\": (\\d+)", 1).cast("int").as("k"),
        )
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
           |FROM events
           |ORDER BY event_id""".stripMargin),
  )

  // F1b — JS parseInt fidelity (SURVEY F1's documented divergence,
  // reference building-inspector.js:102,105): tolerant-prefix parse
  // of a string with trailing junk, where a SQL cast returns null.
  // The messy input is constructed ("<digits>px") so the oracle can
  // replay the JS semantics by re-extracting the digit prefix — a
  // plain CAST of the messy string would error in DuckDB, which is
  // exactly the delta js_parse_int closes.
  private val f1JsParseInt = Q(
    "f1_js_parse_int",
    (s, d) => {
      import s.implicits._
      import graft.functions.exprs.js_parse_int
      Tables.events(s, d)
        .select(
          $"event_id",
          concat(regexp_extract($"props", "\"k\": (\\d+)", 1), lit("px"))
            .as("messy"),
        )
        .select(
          $"event_id",
          $"messy",
          js_parse_int($"messy").as("k_js"),
        )
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |       regexp_extract(props, '"k": (\d+)', 1) || 'px' AS messy,
           |       CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '')
           |            AS BIGINT) AS k_js
           |FROM events
           |ORDER BY event_id""".stripMargin),
  )

  // F2 — guarded string split (empty/null → null, not [""])
  // (reference: consensus_color split, building-inspector.js:120)
  private val f2Split = Q(
    "f2_split_guarded",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select(
          $"p_partkey",
          when(length($"p_name") > 0, size(split($"p_name", " ")))
            .otherwise(lit(null))
            .as("n_tokens"),
          when(length($"p_name") > 0, element_at(split($"p_name", " "), 1))
            .otherwise(lit(null))
            .as("first_token"),
        )
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |       CASE WHEN length(p_name) > 0
           |            THEN CAST(len(string_split(p_name, ' ')) AS INT) END AS n_tokens,
           |       CASE WHEN length(p_name) > 0
           |            THEN string_split(p_name, ' ')[1] END AS first_token
           |FROM part
           |ORDER BY p_partkey""".stripMargin),
  )

  // F6 — degenerate-row filter on a structural predicate
  // (reference: <4-point ring drop, building-inspector.js:138-140)
  private val f6Filter = Q(
    "f6_structural_filter",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter(size(split($"p_name", " ")) >= 2 && $"p_size" >= 10)
        .select($"p_partkey", $"p_name", $"p_size")
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_size
           |FROM part
           |WHERE len(string_split(p_name, ' ')) >= 2 AND p_size >= 10
           |ORDER BY p_partkey""".stripMargin),
  )

  // D1 — first-seen dedup by key over explicit ingest order
  // (reference: consolidatedCache first-wins, building-inspector.js:92-100;
  //  fidelity via row_number over ingest order per SURVEY §2.3)
  private val d1DedupFirst = Q(
    "d1_dedup_first_seen",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, event_id, event_type FROM (
           |  SELECT user_id, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id
           |                            ORDER BY ts, event_id) AS rn
           |  FROM events)
           |WHERE rn = 1
           |ORDER BY user_id""".stripMargin),
  )

  // D3 — last-wins keyBy (dimension map build)
  // (reference: sheetsById overwrite, building-inspector.js:384-386)
  private val d3DedupLast = Q(
    "d3_dedup_last_wins",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, event_id, event_type FROM (
           |  SELECT user_id, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id
           |                            ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events)
           |WHERE rn = 1
           |ORDER BY user_id""".stripMargin),
  )

  // J1 — broadcast hash lookup join (inner, dimension build side)
  // (reference: sheetsById probe, building-inspector.js:103-104)
  private val j1Broadcast = Q(
    "j1_broadcast_lookup_join",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(cents($"o_totalprice")).as("total_cents"),
        )
        .orderBy($"c_mktsegment")
    },
    Some(s"""SELECT c_mktsegment,
            |       count(*) AS n_orders,
            |       CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
            |FROM orders JOIN customer ON o_custkey = c_custkey
            |GROUP BY c_mktsegment
            |ORDER BY c_mktsegment""".stripMargin),
  )

  // J2 — left-outer lookup with null side-output (log records)
  // (reference: borough lookup + "Can't find borough" log,
  //  building-inspector.js:106,129-136)
  private val j2LeftOuterLog = Q(
    "j2_left_outer_with_log",
    (s, d) => {
      import s.implicits._
      // Shrink the dimension to force misses, as the reference's
      // layer-boroughs table misses some layers.
      val dim = Tables.nation(s, d).filter($"n_nationkey" < 20)
      val joined = Tables.customer(s, d)
        .join(broadcast(dim), $"c_nationkey" === $"n_nationkey", "left_outer")
      val data = joined.select(
        concat(lit("customer-"), $"c_custkey").as("id"),
        coalesce($"n_name", lit(null)).as("nation_name"),
        lit("object").as("rtype"),
      )
      val logs = joined
        .filter($"n_name".isNull)
        .select(
          concat(lit("customer-"), $"c_custkey").as("id"),
          concat(lit("Can't find nation for key "), $"c_nationkey").as("nation_name"),
          lit("log").as("rtype"),
        )
      data.unionByName(logs).orderBy($"rtype", $"id")
    },
    Some("""WITH joined AS (
           |  SELECT c_custkey, c_nationkey, n_name
           |  FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
           |    ON c_nationkey = n_nationkey)
           |SELECT id, nation_name, rtype FROM (
           |  SELECT 'customer-' || c_custkey AS id, n_name AS nation_name,
           |         'object' AS rtype
           |  FROM joined
           |  UNION ALL
           |  SELECT 'customer-' || c_custkey AS id,
           |         'Can''t find nation for key ' || c_nationkey AS nation_name,
           |         'log' AS rtype
           |  FROM joined WHERE n_name IS NULL)
           |ORDER BY rtype, id""".stripMargin),
  )

  // G1 — positional explode (the reference's only generator)
  // (reference: consensus_address.forEach with index, building-inspector.js:143-177)
  private val g1Posexplode = Q(
    "g1_posexplode",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
        .select($"p_partkey", ($"pos" + 1).as("pos1"), col("word"))
        .orderBy($"p_partkey", $"pos1")
    },
    Some("""SELECT p_partkey, pos AS pos1, word
           |FROM (
           |  SELECT p_partkey,
           |         unnest(string_split(p_name, ' ')) AS word,
           |         unnest(generate_series(1, len(string_split(p_name, ' ')))) AS pos
           |  FROM part)
           |ORDER BY p_partkey, pos1""".stripMargin),
  )

  // U1 — union of heterogeneous record streams
  // (reference: objects + relations + logs one sink, building-inspector.js:315)
  private val u1Union = Q(
    "u1_union_streams",
    (s, d) => {
      import s.implicits._
      val objects = Tables.supplier(s, d)
        .select(
          concat(lit("supplier-"), $"s_suppkey").as("id"),
          lit("object").as("rtype"),
          $"s_name".as("payload"),
        )
      val relations = Tables.supplier(s, d)
        .select(
          concat(lit("supplier-"), $"s_suppkey").as("id"),
          lit("relation").as("rtype"),
          concat(lit("nation/"), $"s_nationkey").as("payload"),
        )
      objects.unionByName(relations).orderBy($"rtype", $"id")
    },
    Some("""SELECT id, rtype, payload FROM (
           |  SELECT 'supplier-' || s_suppkey AS id, 'object' AS rtype,
           |         s_name AS payload
           |  FROM supplier
           |  UNION ALL
           |  SELECT 'supplier-' || s_suppkey AS id, 'relation' AS rtype,
           |         'nation/' || s_nationkey AS payload
           |  FROM supplier)
           |ORDER BY rtype, id""".stripMargin),
  )

  // ---- capability extensions beyond reference parity (SURVEY §7.2) ----

  // Flagship: TPC-H Q1-shaped aggregation (partial agg + 2-key groupBy).
  private val q1Agg = Q(
    "q1_agg_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter(to_date($"l_shipdate") <= lit("2000-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // l_quantity is a double column of integral values; casting
          // each VALUE to long before summing keeps both engines in
          // exact int64 arithmetic (a post-sum cast would truncate in
          // Spark but round in DuckDB if a value were ever fractional).
          sum($"l_quantity".cast("long")).as("sum_qty"),
          sum(cents($"l_extendedprice")).as("sum_base_cents"),
          sum(cents($"l_extendedprice") * cents($"l_discount")).as("sum_disc_scaled"),
          count(lit(1)).as("count_order"),
        )
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
            |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
            |       CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
            |       CAST(sum(${centsSql("l_extendedprice")} * ${centsSql("l_discount")}) AS BIGINT) AS sum_disc_scaled,
            |       count(*) AS count_order
            |FROM lineitem
            |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin),
  )

  // Multi-way join: revenue per nation (fact ⋈ fact ⋈ broadcast dims).
  private val qMultiJoin = Q(
    "q5_multiway_join_revenue",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          sum(cents($"l_extendedprice")).as("revenue_cents"),
          count(lit(1)).as("n_items"),
        )
        .orderBy($"n_name")
    },
    Some(s"""SELECT n_name,
            |       CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS revenue_cents,
            |       count(*) AS n_items
            |FROM lineitem
            |JOIN orders   ON l_orderkey = o_orderkey
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation   ON c_nationkey = n_nationkey
            |GROUP BY n_name
            |ORDER BY n_name""".stripMargin),
  )

  // Window functions: rank + running sum per partition.
  private val qWindow = Q(
    "qw_window_running",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select(
          $"o_custkey",
          $"o_orderkey",
          row_number().over(w).as("rn"),
          sum(cents($"o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_cents"),
        )
        .orderBy($"o_custkey", $"rn")
    },
    Some(s"""SELECT o_custkey, o_orderkey,
            |       row_number() OVER w AS rn,
            |       CAST(sum(${centsSql("o_totalprice")}) OVER (
            |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
            |FROM orders
            |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            |ORDER BY o_custkey, rn""".stripMargin),
  )

  // Top-k: global sort + limit (TakeOrderedAndProject physically).
  private val qTopK = Q(
    "qt_topk",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_acctbal".desc, $"c_custkey")
        .limit(10)
    },
    Some("""SELECT c_custkey, c_name, c_acctbal
           |FROM customer
           |ORDER BY c_acctbal DESC, c_custkey
           |LIMIT 10""".stripMargin),
  )

  // Semi + anti joins (EXISTS / NOT EXISTS side-outputs, SURVEY §2.4).
  private val qSemiAnti = Q(
    "qj_semi_anti",
    (s, d) => {
      import s.implicits._
      val orderedKeys = Tables.orders(s, d).select($"o_custkey")
      val withOrders = Tables.customer(s, d)
        .join(orderedKeys, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", lit("has_orders").as("status"))
      val withoutOrders = Tables.customer(s, d)
        .join(orderedKeys, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", lit("no_orders").as("status"))
      withOrders.unionByName(withoutOrders).orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, status FROM (
           |  SELECT c_custkey, 'has_orders' AS status FROM customer
           |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |  UNION ALL
           |  SELECT c_custkey, 'no_orders' AS status FROM customer
           |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
           |ORDER BY c_custkey""".stripMargin),
  )

  // Distinct aggregates.
  private val qDistinct = Q(
    "qa_distinct_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |       count(DISTINCT l_partkey) AS n_parts,
           |       count(DISTINCT l_suppkey) AS n_supps,
           |       count(*) AS n_rows
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin),
  )

  // Rollup (grouping sets family).
  private val qRollup = Q(
    "qa_rollup",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents($"o_totalprice")).as("cents"))
        .orderBy(
          $"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first,
        )
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
            |       CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS cents
            |FROM orders
            |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            |ORDER BY o_orderstatus ASC NULLS FIRST,
            |         o_orderpriority ASC NULLS FIRST""".stripMargin),
  )

  // Discrete per-group quantiles (p50/p90/p99 of the price
  // distribution) — the distribution-profiling step of data-quality
  // monitoring. Uses the ceil(p*n)-th order statistic (pure integer
  // index arithmetic, so both engines select the identical row;
  // interpolated quantiles would differ in the last float ulp and can
  // never be hash-gated). One window sort per group + one conditional
  // aggregate; at 100 TB the same numbers come from a partial-agg
  // sketch (KMV-style bounded buffer) when exactness can be traded.
  private val qQuantiles = Q(
    "qa_quantile_disc",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"l_returnflag")
      val byV = w.orderBy($"v", $"l_orderkey", $"l_linenumber")
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
          cents($"l_extendedprice").as("v"))
        .withColumn("rn", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(w))
        .groupBy($"l_returnflag")
        .agg(
          max(when($"rn" === expr("(n * 50 + 99) div 100"), $"v")).as("p50"),
          max(when($"rn" === expr("(n * 90 + 99) div 100"), $"v")).as("p90"),
          max(when($"rn" === expr("(n * 99 + 99) div 100"), $"v")).as("p99"),
        )
        .orderBy($"l_returnflag")
    },
    Some(s"""SELECT l_returnflag,
            |       max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS p50,
            |       max(CASE WHEN rn = (n * 90 + 99) // 100 THEN v END) AS p90,
            |       max(CASE WHEN rn = (n * 99 + 99) // 100 THEN v END) AS p99
            |FROM (
            |  SELECT l_returnflag, v,
            |         row_number() OVER (PARTITION BY l_returnflag
            |           ORDER BY v, l_orderkey, l_linenumber) AS rn,
            |         count(*) OVER (PARTITION BY l_returnflag) AS n
            |  FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
            |               ${centsSql("l_extendedprice")} AS v
            |        FROM lineitem))
            |GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin),
  )

  // Approximate quantiles via a mergeable equi-width histogram — the
  // bounded-memory counterpart of qa_quantile_disc, whose exact answer
  // sorts every group under a window (the cost a 100 TB pipeline
  // avoids). 256 fixed bins between the global min/max (one broadcast
  // scalar agg); per-group bin counts are plain longs, so the sketch
  // is a partial-aggregable histogram that MERGES by addition — the
  // quantile-sketch slot next to KMV (distinct), Misra-Gries (heavy
  // hitters), and the bloom filter (membership). The p-quantile
  // estimate is the lower edge of the first bin whose cumulative
  // count reaches ceil(p·n): deterministic, error bounded by one bin
  // width, identical integer arithmetic in the oracle.
  private val qHistQuantile = Q(
    "qa_histogram_quantile",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
        .select($"l_returnflag", cents($"l_extendedprice").as("v"))
      val bounds = li.agg(min($"v").as("vmin"), max($"v").as("vmax"))
      val binned = li.crossJoin(broadcast(bounds))
        .withColumn("w", expr("greatest(CAST(1 AS BIGINT), (vmax - vmin) div 256 + 1)"))
        .withColumn("bin", expr("(v - vmin) div w"))
        .groupBy($"l_returnflag", $"vmin", $"w", $"bin")
        .agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy($"l_returnflag").orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy($"l_returnflag")
      binned
        .withColumn("cum", sum($"c").over(wcum))
        .withColumn("n", sum($"c").over(wall))
        .select($"l_returnflag", $"vmin", $"w", $"bin", $"cum", $"n",
          explode(typedLit(Seq(500, 950, 990))).as("p_milli"))
        .filter($"cum" * 1000 >= $"p_milli" * $"n")
        .groupBy($"l_returnflag", $"p_milli")
        .agg(
          min($"bin").as("qbin"),
          min($"vmin" + $"bin" * $"w").as("q_edge_cents"),
        )
        .orderBy($"l_returnflag", $"p_milli")
    },
    Some(s"""WITH li AS (
            |  SELECT l_returnflag, ${centsSql("l_extendedprice")} AS v
            |  FROM lineitem),
            |b AS (SELECT min(v) AS vmin, max(v) AS vmax FROM li),
            |binned AS (
            |  SELECT l_returnflag, vmin, w, (v - vmin) // w AS bin,
            |         count(*) AS c
            |  FROM (SELECT li.l_returnflag, li.v, b.vmin,
            |               greatest(1, (b.vmax - b.vmin) // 256 + 1) AS w
            |        FROM li, b)
            |  GROUP BY l_returnflag, vmin, w, bin),
            |cum AS (
            |  SELECT l_returnflag, vmin, w, bin,
            |         sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin
            |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            |         sum(c) OVER (PARTITION BY l_returnflag) AS n
            |  FROM binned),
            |px AS (SELECT unnest([500, 950, 990]) AS p_milli)
            |SELECT l_returnflag, p_milli,
            |       CAST(min(bin) AS BIGINT) AS qbin,
            |       CAST(min(vmin + bin * w) AS BIGINT) AS q_edge_cents
            |FROM cum, px
            |WHERE cum * 1000 >= p_milli * n
            |GROUP BY l_returnflag, p_milli
            |ORDER BY l_returnflag, p_milli""".stripMargin),
  )

  // GROUPING SETS (the general form rollup/cube specialize): one
  // Expand + one hash aggregate — each input row is replicated once
  // per grouping set map-side, so the shuffle stays a single partial
  // aggregation regardless of how many sets are requested. The
  // explicit grouping() flags disambiguate a natural NULL from a
  // rolled-up column, which is what makes the operator safe on
  // nullable grouping keys at any scale.
  private val qGroupingSets = Q(
    "qa_grouping_sets",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupingSets(
          Seq(
            Seq($"o_orderstatus", $"o_orderpriority"),
            Seq($"o_orderpriority"),
            Seq.empty[org.apache.spark.sql.Column],
          ),
          $"o_orderstatus", $"o_orderpriority",
        )
        .agg(
          grouping($"o_orderstatus").cast("int").as("g_status"),
          grouping($"o_orderpriority").cast("int").as("g_priority"),
          count(lit(1)).as("n"),
          sum(cents($"o_totalprice")).as("cents"),
        )
        .orderBy(
          $"g_status", $"g_priority",
          $"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first,
        )
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority,
            |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
            |       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
            |       count(*) AS n,
            |       CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS cents
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
            |                        (o_orderpriority), ())
            |ORDER BY g_status, g_priority,
            |         o_orderstatus ASC NULLS FIRST,
            |         o_orderpriority ASC NULLS FIRST""".stripMargin),
  )

  // Salted skew join: the fact side carries a synthetic salt and the
  // dim side is exploded across all salt values, so one hot key spreads
  // over N shuffle partitions. Semantically identical to the plain
  // join (which is what the oracle runs) — the salt is purely physical.
  private val qSalted = Q(
    "qj_salted_skew_join",
    (s, d) => {
      import s.implicits._
      val Salts = 8
      val dim = Tables.customer(s, d)
        .groupBy(($"c_custkey" % 150).as("user_id"))
        .agg(min($"c_name").as("uname"))
      val saltedDim = dim.select(
        $"user_id", $"uname",
        explode(sequence(lit(0), lit(Salts - 1))).as("salt"))
      val fact = Tables.events(s, d)
        .select($"event_id", $"user_id",
          pmod($"event_id", lit(Salts)).cast("int").as("salt"))
      fact // shuffle_hash hint: auto-broadcast would defeat the salting demo
        .join(saltedDim.hint("shuffle_hash"), Seq("user_id", "salt"))
        .select($"user_id", $"event_id", $"uname")
        .orderBy($"user_id", $"event_id")
    },
    Some("""SELECT d.user_id, e.event_id, d.uname
           |FROM events e
           |JOIN (SELECT c_custkey % 150 AS user_id, min(c_name) AS uname
           |      FROM customer GROUP BY c_custkey % 150) d
           |  ON e.user_id = d.user_id
           |ORDER BY d.user_id, e.event_id""".stripMargin),
  )

  // Custom KMV sketch vs exact distinct: the md5-based k-minimum-values
  // estimator is fully replayable in SQL, so even the APPROXIMATE
  // answer is oracle-checked exactly. (qa_hll_distinct_sketch below
  // replays HyperLogLog the same way via integer-only register math.)
  private val qKmv = Q(
    "qa_kmv_distinct_sketch",
    (s, d) => {
      import s.implicits._
      import graft.functions.exprs.kmv_distinct
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          kmv_distinct($"l_partkey".cast("string"), 256).as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"),
        )
        .orderBy($"l_returnflag")
    },
    Some("""WITH h AS (
           |  SELECT DISTINCT l_returnflag AS g,
           |         CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 12)
           |              AS BIGINT) AS h
           |  FROM lineitem),
           |r AS (
           |  SELECT g, h,
           |         row_number() OVER (PARTITION BY g ORDER BY h) AS rn,
           |         count(*) OVER (PARTITION BY g) AS n
           |  FROM h),
           |x AS (
           |  SELECT l_returnflag AS g,
           |         count(DISTINCT l_partkey) AS exact_parts
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT r.g AS l_returnflag,
           |       CASE WHEN max(r.n) < 256 THEN max(r.n)
           |            ELSE CAST(floor(255 * 281474976710656.0 /
           |                 max(CASE WHEN r.rn = 256 THEN r.h END)) AS BIGINT)
           |       END AS approx_parts,
           |       max(x.exact_parts) AS exact_parts
           |FROM r JOIN x ON r.g = x.g
           |WHERE r.rn <= 256
           |GROUP BY r.g
           |ORDER BY r.g""".stripMargin),
  )

  // HYPERLOGLOG distinct sketch, oracle-replayed exactly: md5-derived
  // 48-bit hash split into an 8-bit register index and a 40-bit
  // suffix; the leading-zero rank comes from an integer CASE ladder
  // (floor-log2 by successive shifts — no floating log, so both
  // engines agree bit-for-bit), registers keep max(rank), and the
  // harmonic sum is computed as exact integers 2^(41-rank) (upper
  // bound 256·2^41 < 2^63) with ONE final IEEE division producing
  // the estimate. Scale story: the register table is the mergeable
  // summary — the groupBy (group, register) partial-aggregates
  // map-side to ≤ m=256 rows per group per task regardless of input
  // size, exactly the property that makes HLL the industry-standard
  // distinct counter at 100 TB (KMV above ships k rows; HLL ships m
  // 6-bit registers and unions by max). No small-range linear-counting
  // branch: that correction needs ln(), which is not
  // correctly-rounded-guaranteed across engines — the raw estimator
  // is the oracle-stable choice and its error is the documented
  // 1.04/√m ≈ 6.5% at m=256 — and m=256 keeps every gate scale
  // (≥1081 distinct orderkeys per flag at sf0.001) above the 2.5·m
  // small-range threshold where the raw estimator is unbiased.
  private val qHll = Q(
    "qa_hll_distinct_sketch",
    (s, d) => {
      import s.implicits._
      val ranked = Tables.lineitem(s, d)
        .select($"l_returnflag",
          expr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 12), 16, 10) AS BIGINT)").as("h"))
        .withColumn("reg", expr("h % 256"))
        .withColumn("w", expr("h div 256"))
        .withColumn("a5", expr("CASE WHEN w >= 4294967296 THEN 32 ELSE 0 END"))
        .withColumn("v5", expr("CASE WHEN w >= 4294967296 THEN w div 4294967296 ELSE w END"))
        .withColumn("a4", expr("CASE WHEN v5 >= 65536 THEN 16 ELSE 0 END"))
        .withColumn("v4", expr("CASE WHEN v5 >= 65536 THEN v5 div 65536 ELSE v5 END"))
        .withColumn("a3", expr("CASE WHEN v4 >= 256 THEN 8 ELSE 0 END"))
        .withColumn("v3", expr("CASE WHEN v4 >= 256 THEN v4 div 256 ELSE v4 END"))
        .withColumn("a2", expr("CASE WHEN v3 >= 16 THEN 4 ELSE 0 END"))
        .withColumn("v2", expr("CASE WHEN v3 >= 16 THEN v3 div 16 ELSE v3 END"))
        .withColumn("a1", expr("CASE WHEN v2 >= 4 THEN 2 ELSE 0 END"))
        .withColumn("v1", expr("CASE WHEN v2 >= 4 THEN v2 div 4 ELSE v2 END"))
        .withColumn("rnk", expr(
          "CASE WHEN w = 0 THEN 41 ELSE 40 - (a5 + a4 + a3 + a2 + a1 + CASE WHEN v1 >= 2 THEN 1 ELSE 0 END) END"))
      val regs = ranked.groupBy($"l_returnflag", $"reg")
        .agg(max($"rnk").as("mr"))
      val sketch = regs.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("np"),
          sum(expr("shiftright(2199023255552, CAST(mr AS INT))")).as("sp"))
        .withColumn("approx_orders_hll", expr(
          "CAST(floor((0.7213 / (1 + 1.079 / 256)) * 65536 * 2199023255552 / (sp + (256 - np) * 2199023255552)) AS BIGINT)"))
      val exact = Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("exact_orders"))
      sketch.join(exact, "l_returnflag")
        .select($"l_returnflag", $"approx_orders_hll", $"exact_orders")
        .orderBy($"l_returnflag")
    },
    Some("""WITH h AS (
           |  SELECT l_returnflag AS g,
           |         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12)
           |              AS BIGINT) AS h
           |  FROM lineitem),
           |b AS (SELECT g, h % 256 AS reg, h // 256 AS w FROM h),
           |r5 AS (SELECT g, reg, w,
           |              CASE WHEN w >= 4294967296 THEN 32 ELSE 0 END AS a5,
           |              CASE WHEN w >= 4294967296 THEN w // 4294967296 ELSE w END AS v5
           |       FROM b),
           |r4 AS (SELECT *, CASE WHEN v5 >= 65536 THEN 16 ELSE 0 END AS a4,
           |              CASE WHEN v5 >= 65536 THEN v5 // 65536 ELSE v5 END AS v4 FROM r5),
           |r3 AS (SELECT *, CASE WHEN v4 >= 256 THEN 8 ELSE 0 END AS a3,
           |              CASE WHEN v4 >= 256 THEN v4 // 256 ELSE v4 END AS v3 FROM r4),
           |r2 AS (SELECT *, CASE WHEN v3 >= 16 THEN 4 ELSE 0 END AS a2,
           |              CASE WHEN v3 >= 16 THEN v3 // 16 ELSE v3 END AS v2 FROM r3),
           |r1 AS (SELECT *, CASE WHEN v2 >= 4 THEN 2 ELSE 0 END AS a1,
           |              CASE WHEN v2 >= 4 THEN v2 // 4 ELSE v2 END AS v1 FROM r2),
           |rk AS (SELECT g, reg,
           |              CASE WHEN w = 0 THEN 41
           |                   ELSE 40 - (a5 + a4 + a3 + a2 + a1 +
           |                              CASE WHEN v1 >= 2 THEN 1 ELSE 0 END) END AS rnk
           |       FROM r1),
           |regs AS (SELECT g, reg, max(rnk) AS mr FROM rk GROUP BY g, reg),
           |s AS (SELECT g, count(*) AS np,
           |             CAST(sum(2199023255552 >> mr) AS BIGINT) AS sp
           |      FROM regs GROUP BY g),
           |x AS (SELECT l_returnflag AS g, count(DISTINCT l_orderkey) AS exact_orders
           |      FROM lineitem GROUP BY 1)
           |SELECT s.g AS l_returnflag,
           |       CAST(floor((0.7213 / (1 + 1.079 / 256)) * 65536 * 2199023255552
           |            / (sp + (256 - np) * 2199023255552)) AS BIGINT) AS approx_orders_hll,
           |       x.exact_orders
           |FROM s JOIN x ON s.g = x.g
           |ORDER BY l_returnflag""".stripMargin),
  )

  // COUNT-MIN SKETCH point-frequency estimation, oracle-replayed
  // exactly: a d=4 × w=256 counter matrix, queried for the top-30
  // exact keys so the one-sided error is visible next to the truth:
  // estimate = min over the 4 rows of the key's bucket counter, always
  // >= the true count, over by ~n/w per colliding bucket. The hash
  // family is the repo-standard two-step: ONE 48-bit md5-prefix base
  // hash per input row, then the integer universal family
  // (a_i·h + b_i) mod p for the 4 sketch rows — measured 3.6× cheaper
  // than salting md5 per (row, key) (one digest per row instead of
  // four; the family is three codegen'd integer ops), with every
  // intermediate < 2^52 so DuckDB's overflow-checked BIGINT replays
  // it. Scale story: the sketch IS the mergeable summary — the
  // (row, bucket) groupBy partial-aggregates map-side to <= d·w =
  // 1024 rows per task regardless of input size, and the probe side
  // is a broadcast join of the 1024-row sketch against the candidate
  // keys. Complements the Misra-Gries entry (qa_heavy_hitters): MG
  // keeps exact counts for FREQUENT keys only; CMS answers point
  // queries for ANY key at fixed memory, which is why production
  // pipelines ship both. (Bench note: the hash pass is bounded by the
  // fixture's single-file scan parallelism — 3 row groups — like the
  // other scan-bound entries; a multi-file layout splits it for free.)
  private val qCms = Q(
    "qa_cms_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val D = 4; val W = 256; val P = 281474976710597L // largest prime < 2^48
      val baseHash =
        "CAST(conv(substr(md5(CAST(l_partkey AS STRING)), 1, 12), 16, 10) AS BIGINT)"
      def bucket = (((lit(2L) * $"row_i" + 3L) * ($"h" % P) +
        (lit(5L) * $"row_i" + 7L)) % P % W).as("bucket")
      val keys = Tables.lineitem(s, d).select($"l_partkey")
      val sketch = keys
        .withColumn("h", expr(baseHash))
        .select($"h",
          explode(array((0 until D).map(i => lit(i.toLong)): _*)).as("row_i"))
        .select($"row_i", bucket)
        .groupBy($"row_i", $"bucket").agg(count(lit(1)).as("c"))
      val top = keys.groupBy($"l_partkey").agg(count(lit(1)).as("exact_n"))
        .orderBy($"exact_n".desc, $"l_partkey").limit(30)
      top
        .withColumn("h", expr(baseHash))
        .select($"l_partkey", $"exact_n", $"h",
          explode(array((0 until D).map(i => lit(i.toLong)): _*)).as("row_i"))
        .select($"l_partkey", $"exact_n", $"row_i", bucket)
        .join(broadcast(sketch), Seq("row_i", "bucket"))
        .groupBy($"l_partkey", $"exact_n")
        .agg(min($"c").as("cms_n"))
        .select($"l_partkey", $"cms_n", $"exact_n")
        .orderBy($"exact_n".desc, $"l_partkey")
    },
    Some("""WITH b AS (
           |  SELECT l_partkey,
           |         CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 12)
           |              AS BIGINT) AS h
           |  FROM lineitem),
           |h AS (
           |  SELECT r.i AS row_i,
           |         ((2 * r.i + 3) * (h % 281474976710597) + (5 * r.i + 7))
           |           % 281474976710597 % 256 AS bucket
           |  FROM b CROSS JOIN range(0, 4) r(i)),
           |sk AS (SELECT row_i, bucket, count(*) AS c FROM h GROUP BY 1, 2),
           |top AS (
           |  SELECT l_partkey, count(*) AS exact_n FROM lineitem GROUP BY 1
           |  ORDER BY exact_n DESC, l_partkey LIMIT 30),
           |probe AS (
           |  SELECT t.l_partkey, t.exact_n, r.i AS row_i,
           |         ((2 * r.i + 3) *
           |          (CAST('0x' || substr(md5(CAST(t.l_partkey AS VARCHAR)), 1, 12)
           |                AS BIGINT) % 281474976710597) + (5 * r.i + 7))
           |           % 281474976710597 % 256 AS bucket
           |  FROM top t CROSS JOIN range(0, 4) r(i))
           |SELECT p.l_partkey, CAST(min(sk.c) AS BIGINT) AS cms_n,
           |       p.exact_n
           |FROM probe p JOIN sk USING (row_i, bucket)
           |GROUP BY p.l_partkey, p.exact_n
           |ORDER BY p.exact_n DESC, p.l_partkey""".stripMargin),
  )

  // K-ANONYMITY GENERALIZATION AUDIT (the privacy gate a training
  // corpus with user-derived rows needs alongside ta_pii_scrub):
  // quasi-identifiers here are (nation, market segment, account-balance
  // 1000-unit bucket). Each record reports the anonymity-set size it
  // achieves on a two-level generalization lattice — level 0 keeps the
  // full QI triple if its group already has ≥ k=6 members, level 1
  // generalizes the balance bucket away, level 2 means even the coarse
  // pair is below k and the record must be suppressed. Everything is a
  // QI-keyed partial aggregate joined back on the same keys — two
  // shuffles on bounded-cardinality keys, no driver state, map-side
  // combine collapsing each task to ≤|QI domain| rows; the pattern is
  // identical at 100 TB. The balance bucket floors CENTS/1e5 as a
  // double (floor semantics match DuckDB's `//` on negatives, where
  // BIGINT division truncation would not).
  private val kAnonymity = Q(
    "qa_k_anonymity",
    (s, d) => {
      import s.implicits._
      val k = 6L
      val cust = Tables.customer(s, d).select(
        $"c_custkey",
        $"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"),
        floor(cents($"c_acctbal") / lit(100000.0)).cast("long").as("bal_bucket"))
      val fine = cust.groupBy($"nation", $"segment", $"bal_bucket")
        .agg(count(lit(1)).as("nf"))
      val coarse = cust.groupBy($"nation", $"segment")
        .agg(count(lit(1)).as("nc"))
      cust
        .join(fine, Seq("nation", "segment", "bal_bucket"))
        .join(coarse, Seq("nation", "segment"))
        .select(
          $"c_custkey", $"nation", $"segment", $"bal_bucket",
          when($"nf" >= k, 0L).when($"nc" >= k, 1L).otherwise(2L)
            .as("gen_level"),
          when($"nf" >= k, $"nf").when($"nc" >= k, $"nc").otherwise(0L)
            .as("k_size"))
        .orderBy($"c_custkey")
    },
    Some(s"""WITH cust AS (
            |  SELECT c_custkey,
            |         CAST(c_nationkey AS BIGINT) AS nation,
            |         c_mktsegment AS segment,
            |         CAST(floor(${centsSql("c_acctbal")} / 100000.0) AS BIGINT)
            |           AS bal_bucket
            |  FROM customer),
            |fine AS (
            |  SELECT nation, segment, bal_bucket, count(*) AS nf
            |  FROM cust GROUP BY 1, 2, 3),
            |coarse AS (
            |  SELECT nation, segment, count(*) AS nc
            |  FROM cust GROUP BY 1, 2)
            |SELECT c.c_custkey, c.nation, c.segment, c.bal_bucket,
            |       CAST(CASE WHEN f.nf >= 6 THEN 0
            |                 WHEN x.nc >= 6 THEN 1 ELSE 2 END AS BIGINT)
            |         AS gen_level,
            |       CAST(CASE WHEN f.nf >= 6 THEN f.nf
            |                 WHEN x.nc >= 6 THEN x.nc ELSE 0 END AS BIGINT)
            |         AS k_size
            |FROM cust c
            |JOIN fine f USING (nation, segment, bal_bucket)
            |JOIN coarse x USING (nation, segment)
            |ORDER BY c.c_custkey""".stripMargin),
  )

  def all: Seq[Q] = Seq(
    s4Scan, p1Project, p2ChildId, p4Relations, f1Cast, f1JsParseInt,
    f2Split, f6Filter,
    d1DedupFirst, d3DedupLast, j1Broadcast, j2LeftOuterLog, g1Posexplode,
    u1Union, q1Agg, qMultiJoin, qWindow, qTopK, qSemiAnti, qDistinct,
    qRollup, qGroupingSets, qQuantiles, qHistQuantile, qSalted, qKmv, qHll,
    qCms, kAnonymity,
  )
}
