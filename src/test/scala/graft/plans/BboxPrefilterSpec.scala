package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.exprs._

/** The bbox-prefilter optimizer rule must rewrite a naive
  * `layerEq && st_contains(...)` join to project the polygon bbox on
  * the build side and guard the exact test — without changing results
  * or the join's visible schema, and terminating the fixed-point batch
  * (idempotence).
  */
class BboxPrefilterSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def naiveSpatialJoin(s: SparkSession) = {
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val polys = graft.model.Tables.supplier(s, d).select(
      $"s_suppkey", $"s_nationkey".as("p_layer"),
      array(array(
        array(($"s_suppkey" % 97).cast("double"), (($"s_suppkey" % 89) + 1).cast("double")),
        array((($"s_suppkey" % 97) + 3).cast("double"), (($"s_suppkey" % 89) + 1).cast("double")),
        array((($"s_suppkey" % 97) + 3).cast("double"), (($"s_suppkey" % 89) + 4).cast("double")),
        array(($"s_suppkey" % 97).cast("double"), (($"s_suppkey" % 89) + 4).cast("double")),
        array(($"s_suppkey" % 97).cast("double"), (($"s_suppkey" % 89) + 1).cast("double")),
      )).as("rings"))
    val points = graft.model.Tables.customer(s, d).select(
      $"c_custkey", $"c_nationkey".as("c_layer"),
      array((($"c_custkey" % 95) + 1).cast("double"),
        (($"c_custkey" % 87) + 2).cast("double")).as("pt"))
    points
      .join(polys, $"c_layer" === $"p_layer" && st_contains($"rings", $"pt"))
      .select($"c_custkey", $"s_suppkey")
      .orderBy($"c_custkey", $"s_suppkey")
  }

  test("rule injects the bbox guard, preserves results and schema") {
    val expected = naiveSpatialJoin(spark).collect().toSeq
    assert(expected.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AddBboxPrefilter
    try {
      val df = naiveSpatialJoin(spark)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_bbox"), s"rule did not fire:\n$optimized")
      assert(df.columns.toSeq == Seq("c_custkey", "s_suppkey"), "schema unchanged")
      assert(df.collect().toSeq == expected, "results unchanged")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AddBboxPrefilter)
    }
  }
}
