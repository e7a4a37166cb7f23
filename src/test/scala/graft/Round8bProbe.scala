package graft

import org.apache.spark.sql.SparkSession

/** Grown-corpus decade probe for the round-8 session-3 additions,
  * plus a re-run of the kNN-graph pair under the ADAPTIVE LSH
  * geometry (the round-7 probe measured exponent 1.42/decade at the
  * fixed 6-plane geometry; past 16k vectors the adaptive plane count
  * should hold the Σocc² candidate law near-linear). One JSONL row
  * per (query, dir) with wall time and result rows.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2,d3 sbt "Test/runMain graft.Round8bProbe"
  */
object Round8bProbe {
  val Names: Seq[String] = Seq(
    "qa_chi2_independence", "qa_theil_sen_slope",
    "gr_closeness_centrality", "gr_random_walks",
    "sim_ndcg_eval", "ev_pit_features",
    "sim_knn_graph", "sim_knn_edge_coverage",
    "qa_cramers_v", "ev_markov_stationary", "ev_inter_event_quantiles",
    "mm_phash_clusters", "ta_cooccurrence_lift",
    "qa_autocorrelation_lag", "ev_burst_detection", "sql_surface_similarity",
    "gr_katz_centrality", "mm_frame_dedup",
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
