package graft

import org.apache.spark.sql.SparkSession

/** Grown-corpus decade probe for the round-7 session-9/10 additions
  * (the 47 entries the round-7 probe sweep missed) plus round 8's
  * sim_knn_edge_coverage — one JSONL row per (query, dir) with wall
  * time and result rows, so BASELINE.md can record per-decade growth
  * exponents for every catalogue entry, not just the first 128.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2,d3 sbt "Test/runMain graft.Round8Probe"
  */
object Round8Probe {
  val Names: Seq[String] = Seq(
    "ev_attribution_position", "ev_dau_wau_stickiness", "ev_feature_matrix",
    "ev_forecast_backtest", "ev_funnel_time_to_convert", "ev_hazard_curve",
    "ev_pareto_concentration", "ev_rfm_segments", "ev_top_paths",
    "geo_idw_surface", "geo_quadtree_density", "gr_assortativity",
    "gr_hits", "gr_kcore", "gr_personalized_pagerank",
    "mm_audio_fingerprint", "mm_phash_hamming_hist", "mm_silence_segments",
    "pipe_dataset_card", "qa_data_contract", "qa_discount_elasticity",
    "qa_dow_seasonality", "qa_freshness_lag", "qa_kitagawa_decomposition",
    "qa_reconciliation", "qa_ship_lag_quantiles", "qa_simpson_paradox",
    "sim_embedding_drift", "sim_kcenter_coreset", "sim_knn_graph",
    "sim_knn_edge_coverage", "sim_matryoshka_eval", "sim_mmr_select",
    "ta_burrows_delta", "ta_burstiness_topk", "ta_extractive_summary",
    "ta_heaps_vocab_curve", "ta_lang_confusion", "ta_postings_varint_size",
    "ta_rake_keyphrases", "ta_readability_fk", "ta_vocab_richness",
    "td_dedup_eval", "td_hash_collision_audit", "td_neyman_alloc",
    "td_threshold_sweep", "td_tokenizer_fertility", "td_uncertainty_sample",
  )

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1"))
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

    for (d <- dirs; name <- Names) {
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
  }
}
