package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing is THE co-location lever for repeated large-large joins
  * at scale: both fact tables written `bucketBy(N, key)` hash-place
  * their rows identically, so a later equi-join on the key needs NO
  * shuffle on either side — the exchange that would move terabytes on
  * a 100 TB corpus simply is not in the plan. This spec pins that
  * plan shape end-to-end through real bucketed parquet tables: the
  * join must contain ZERO ShuffleExchange over the scans and still
  * produce exactly the unbucketed join's rows.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-bucketed").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val here = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => 0
      }
      here + inner + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bucketed tables join with zero shuffle and exact results") {
    import spark.implicits._
    val n = 10000
    val facts = spark.range(n).select(
      $"id".as("k"), ($"id" % 97).as("v1"))
    val dims = spark.range(n / 2).select(
      $"id".as("k"), ($"id" % 89).as("v2"))

    facts.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucketed_facts")
    dims.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucketed_dims")

    val joined = spark.table("graft_bucketed_facts")
      .join(spark.table("graft_bucketed_dims"), "k")
      .select($"k", $"v1", $"v2")
    joined.count() // materialize so AQE finalizes the plan

    // co-located: the equi-join rides the bucketing, nothing shuffles
    assert(shuffles(joined) == 0,
      s"bucketed join should need no exchange:\n${joined.queryExecution.executedPlan}")

    // and an UNBUCKETED copy of the same join must shuffle both sides —
    // proving the zero above comes from bucketing, not from the data
    // being conveniently tiny
    val unbucketed = facts.join(dims, "k").select($"k", $"v1", $"v2")
    unbucketed.count()
    assert(shuffles(unbucketed) >= 2,
      s"control join should shuffle both sides:\n${unbucketed.queryExecution.executedPlan}")

    // results identical
    val a = joined.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = unbucketed.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length == n / 2 && a.sameElements(b))

    spark.sql("DROP TABLE graft_bucketed_facts")
    spark.sql("DROP TABLE graft_bucketed_dims")
  }
}
