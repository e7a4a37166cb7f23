package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the zero-shuffle join path for
  * repeated big-fact joins at scale: both sides bucketed by the join
  * key join WITHOUT an Exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    val ev = graft.model.Tables.events(spark, d)
      .select($"event_id", $"user_id", $"value")
    spark.sql("DROP TABLE IF EXISTS g_ev_a")
    spark.sql("DROP TABLE IF EXISTS g_ev_b")
    ev.write.format("parquet").bucketBy(8, "user_id")
      .option("path", s"$tmp/a").saveAsTable("g_ev_a")
    ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .write.format("parquet").bucketBy(8, "user_id")
      .option("path", s"$tmp/b").saveAsTable("g_ev_b")
    try {
      val joined = spark.table("g_ev_a").join(spark.table("g_ev_b"), "user_id")
      val n = joined.count()
      assert(n == ev.count(), "inner join on complete key set keeps all rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_ev_a")
      spark.sql("DROP TABLE IF EXISTS g_ev_b")
    }
  }
}
