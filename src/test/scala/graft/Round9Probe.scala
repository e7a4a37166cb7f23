package graft

import org.apache.spark.sql.SparkSession

/** Grown-corpus decade probe for the round-9 additions (the same
  * harness shape as Round8bProbe): one JSONL row per (query, dir)
  * with wall time and result rows, so per-decade scaling exponents
  * are measured, not asserted.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2,d3 sbt "Test/runMain graft.Round9Probe"
  */
object Round9Probe {
  val Names: Seq[String] = Seq(
    "qa_mann_whitney_u", "qa_spearman_corr", "gr_truss_support",
    "sim_rrf_fusion", "pipe_compaction_bins", "ta_msttr_diversity",
    "sql_surface_text", "geo_grid_ring_smooth", "geo_union_area",
    "qa_two_proportion_z2", "ev_attribution_window_sweep",
    "gr_closeness_centrality", "mm_phash_neardup",
    "gr_link_predict", "gr_clustering_coeff", "qa_kendall_tau",
    "sim_pq_recall_eval",
  )

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1"))
    val names = sys.env.get("SPARK_GRAFT_PROBE_NAMES")
      .map(_.split(",").map(_.trim).toSet)
      .map(sel => Names.filter(sel))
      .getOrElse(Names)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.exprs.register(spark)

    for (d <- dirs; name <- names) {
      val q = QueryCatalog.all.find(_.name == name).get
      try {
        val t0 = System.nanoTime()
        val rows = q.fn(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"$name","dir":"$d","rows":$rows,"sec":$sec%.2f}""")
      } catch {
        case e: Throwable =>
          println(s"""{"probe":"$name","dir":"$d","error":"${
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\n\\r]", " ").take(160)}"}""")
      }
      System.out.flush()
    }
    spark.stop()
  }
}
