package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Prints executed-plan exchange/broadcast/BNLJ/SinglePartition counts
  * for the round-9 entries so PlanBudgetSpec pins are measured, not
  * guessed.
  *
  *   sbt "Test/runMain graft.Round9PlanProbe [sfDir]"
  */
object Round9PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def collectExec(root: SparkPlan): Seq[SparkPlan] = {
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val inner = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case qs: QueryStageExec => walk(qs.plan)
          case im: InMemoryTableScanExec if seen.add(im.relation.cachedPlan) =>
            walk(im.relation.cachedPlan)
          case _ => Seq.empty
        }
        p +: (inner ++ p.subqueries.flatMap(walk) ++ p.children.flatMap(walk))
      }
      walk(root)
    }

    val names = Seq("qa_mann_whitney_u", "qa_spearman_corr",
      "gr_truss_support", "sim_rrf_fusion", "pipe_compaction_bins",
      "ta_msttr_diversity", "sql_surface_text", "geo_grid_ring_smooth",
      "gr_closeness_centrality", "qa_two_proportion_z2", "geo_union_area",
      "ev_attribution_window_sweep", "qa_kendall_tau", "gr_clustering_coeff",
      "sim_pq_recall_eval")
    for (n <- names) {
      val q = QueryCatalog.all.find(_.name == n).get
      val nodes = collectExec(q.fn(spark, sf).queryExecution.executedPlan)
      val ex = nodes.count {
        case _: ShuffleExchangeExec | _: BroadcastExchangeExec => true
        case _ => false
      }
      val bc = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
      val bnlj = nodes.count(_.nodeName.contains("NestedLoop"))
      val singles = nodes.count {
        case s: ShuffleExchangeExec =>
          s.outputPartitioning ==
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition
        case _ => false
      }
      println(s"[plan-probe] $n exchanges=$ex broadcasts=$bc bnlj=$bnlj singles=$singles")
    }
    spark.stop()
  }
}
