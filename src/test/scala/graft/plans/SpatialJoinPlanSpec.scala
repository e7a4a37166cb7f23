package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.exprs._

/** The custom spatial strategy must (a) actually fire — the physical
  * plan contains BroadcastSpatialJoinExec — and (b) produce EXACTLY
  * the rows of the stock plan (broadcast hash join + residual), for
  * inner and left-outer shapes, including the full inspector pipeline.
  */
class SpatialJoinPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def spatialQuery(s: SparkSession, joinType: String) = {
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val polys = graft.model.Tables.supplier(s, d).select(
      $"s_suppkey",
      $"s_nationkey".as("p_layer"),
      ($"s_suppkey" % 97).cast("double").as("x0"),
      (($"s_suppkey" % 89) + 1).cast("double").as("y0"),
      (($"s_suppkey" % 97) + 1 + ($"s_suppkey" % 5)).cast("double").as("x1"),
      (($"s_suppkey" % 89) + 3 + ($"s_suppkey" % 7)).cast("double").as("y1"),
    ).select(
      $"s_suppkey", $"p_layer",
      array(array(
        array($"x0", $"y0"), array($"x1", $"y0"), array($"x1", $"y1"),
        array($"x0", $"y1"), array($"x0", $"y0"))).as("rings"),
    )
    val points = graft.model.Tables.customer(s, d).select(
      $"c_custkey",
      $"c_nationkey".as("c_layer"),
      (($"c_custkey" % 95) + 1).cast("double").as("px"),
      (($"c_custkey" % 87) + 2).cast("double").as("py"),
    )
    points
      .join(polys,
        $"c_layer" === $"p_layer" && st_contains($"rings", array($"px", $"py")),
        joinType)
      .select($"c_custkey", $"s_suppkey")
      .orderBy($"c_custkey", $"s_suppkey")
  }

  private def collectRows(joinType: String): Seq[(Long, Any)] =
    spatialQuery(spark, joinType).collect()
      .map(r => (r.getLong(0), r.get(1))).toSeq

  test("strategy fires and matches the stock plan (inner + left_outer)") {
    val expectInner = collectRows("inner")
    val expectOuter = collectRows("left_outer")
    assert(expectOuter.size >= expectInner.size)
    GraftPlanner.install(spark)
    // pin the threshold: the shared test session may carry another
    // suite's -1 (broadcast disabled), which the size guard honours
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      val planStr = spatialQuery(spark, "inner").queryExecution.executedPlan.toString
      assert(planStr.contains("BroadcastSpatialJoin"), s"strategy did not fire:\n$planStr")
      assert(collectRows("inner") == expectInner)
      assert(collectRows("left_outer") == expectOuter)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      GraftPlanner.uninstall(spark)
    }
  }

  // Size guard: a polygon side over the broadcast threshold must NOT
  // be claimed by the strategy (its exec collects that side to the
  // driver) — the default equi+bbox plan runs instead, same rows.
  test("strategy falls back to the default plan over the size threshold") {
    val expectInner = collectRows("inner")
    GraftPlanner.install(spark)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val planStr = spatialQuery(spark, "inner").queryExecution.executedPlan.toString
      assert(!planStr.contains("BroadcastSpatialJoin"),
        s"strategy fired despite tiny threshold:\n$planStr")
      assert(collectRows("inner") == expectInner)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val planStr2 = spatialQuery(spark, "inner").queryExecution.executedPlan.toString
      assert(!planStr2.contains("BroadcastSpatialJoin"),
        s"strategy fired with broadcasting disabled:\n$planStr2")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      GraftPlanner.uninstall(spark)
    }
  }

  test("inspector pipeline output is identical under the custom strategy") {
    def run(): Map[String, Int] =
      graft.sources.NdjsonSink.lines(graft.Engine.transform(spark, graft.Engine.Dirs(
        consolidated = getClass.getResource("/inspector/consolidated.geojson").getPath,
        toponyms = getClass.getResource("/inspector/toponyms.geojson").getPath,
        sheets = getClass.getResource("/inspector/sheets.geojson").getPath,
        layerBoroughs = getClass.getResource("/inspector/layer-boroughs.json").getPath,
      ))).collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap

    val stock = run()
    GraftPlanner.install(spark)
    try {
      val custom = run()
      assert(custom == stock)
    } finally GraftPlanner.uninstall(spark)
  }
}
