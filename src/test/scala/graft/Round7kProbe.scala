package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grown-corpus scaling probe for the round-7 session-10 additions.
  * Each row records wall time PLUS the intermediate cardinality the
  * entry's scale argument rests on, so the exponents are measured:
  *
  *   - ta_collocations: distinct bigram pairs (the pair-agg's real
  *     key volume under a GROWN vocabulary) and the post-min-count
  *     survivor count;
  *   - td_cdc_chunks: total/distinct chunks — the chunk-hash agg
  *     volume (claim: ∝ tokens, expected chunk length fixed at 4);
  *   - ta_textrank_keywords: graph nodes/edges under grown vocab
  *     (claim: per-round cost ∝ edges, NOT corpus);
  *   - gr_modularity: kept edges m and community count (claim: the
  *     3 LPA rounds dominate at O(m)/round);
  *   - qa_cusum_drift: the (type, day) carry-table size — the ONLY
  *     table whose windows cross days (claim: corpus-size-free);
  *   - ev_attribution_linear: conversions and the touch-join pair
  *     volume (the user-keyed fanout bound);
  *   - geo_dbscan_core: candidate-pair volume (claim: ∝ n at
  *     constant density — Σ occupancy² over cells);
  *   - sim_pca_power: vecs (the gram pass is the corpus cost; the
  *     3 iterations are ≤ d² rows at any n);
  *   - ta_c4_rules / qa_ab_test_gate / qa_benford /
  *     pipe_csv_flatten: map-only or bounded-key passes — time only.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.Round7kProbe"
  */
object Round7kProbe {
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
    import spark.implicits._

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def run(name: String, d: String): (Long, Double) = {
      val q = QueryCatalog.all.find(_.name == name).get
      time(q.fn(spark, d).count())
    }
    def emit(fields: (String, Any)*): Unit =
      println(fields.map {
        case (k, v: String) => s""""$k":"$v""""
        case (k, v: Double) => f""""$k":$v%.2f"""
        case (k, v)         => s""""$k":$v"""
      }.mkString("{", ",", "}"))

    for (d <- dirs) {
      val docs = graft.model.Tables.documents(spark, d)
      val nDocs = docs.count()
      val toks = docs.select($"doc_id", split($"text", " ").as("w"))
      val nTokens = toks.select(expr("cast(sum(size(w)) as bigint)")).head.getLong(0)

      val pairsAll = toks.filter(size($"w") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1)," +
            " i -> struct(element_at(w, i) AS x, element_at(w, i + 1) AS y))"))
          .as("p"))
        .groupBy($"p.x", $"p.y").count()
      val nPairKeys = pairsAll.count()
      val (colRows, colT) = run("ta_collocations", d)
      emit("probe" -> "ta_collocations", "dir" -> d, "tokens" -> nTokens,
        "distinct_pairs" -> nPairKeys, "rows" -> colRows, "sec" -> colT)

      val q2 = QueryCatalog.all.find(_.name == "td_cdc_chunks").get
      val (cdc, cdcT) = time {
        q2.fn(spark, d).select(max($"total_chunks"), max($"distinct_chunks")).head()
      }
      emit("probe" -> "td_cdc_chunks", "dir" -> d, "tokens" -> nTokens,
        "total_chunks" -> cdc.getLong(0), "distinct_chunks" -> cdc.getLong(1),
        "sec" -> cdcT)

      val nNodes = toks.select(explode($"w").as("t")).distinct().count()
      val (trRows, trT) = run("ta_textrank_keywords", d)
      emit("probe" -> "ta_textrank_keywords", "dir" -> d, "vocab" -> nNodes,
        "rows" -> trRows, "sec" -> trT)

      val q3 = QueryCatalog.all.find(_.name == "gr_modularity").get
      val (modu, moduT) = time {
        q3.fn(spark, d).agg(max($"m_edges"), count(lit(1)), sum($"e_intra")).head()
      }
      emit("probe" -> "gr_modularity", "dir" -> d, "m_edges" -> modu.getLong(0),
        "communities" -> modu.getLong(1), "intra" -> modu.getLong(2),
        "sec" -> moduT)

      val nEvents = graft.model.Tables.events(spark, d).count()
      val DayNs = 86400L * 1000 * 1000 * 1000
      val nCarry = graft.model.Tables.events(spark, d)
        .select($"event_type", expr(s"ts div $DayNs").as("day"))
        .distinct().count()
      val (cuRows, cuT) = run("qa_cusum_drift", d)
      emit("probe" -> "qa_cusum_drift", "dir" -> d, "events" -> nEvents,
        "carry_rows" -> nCarry, "types" -> cuRows, "sec" -> cuT)

      val q4 = QueryCatalog.all.find(_.name == "ev_attribution_linear").get
      val (att, attT) = time {
        q4.fn(spark, d).agg(sum($"n_touchpoints"), sum($"credit_ppm_total")).head()
      }
      emit("probe" -> "ev_attribution_linear", "dir" -> d, "events" -> nEvents,
        "pairs" -> att.getLong(0), "credit_total" -> att.getLong(1),
        "sec" -> attT)

      val q5 = QueryCatalog.all.find(_.name == "geo_dbscan_core").get
      val (db, dbT) = time {
        q5.fn(spark, d).agg(count(lit(1)), sum($"n_nbrs")).head()
      }
      emit("probe" -> "geo_dbscan_core", "dir" -> d, "points" -> db.getLong(0),
        "eps_pairs" -> db.getLong(1), "sec" -> dbT)

      val nVecs = graft.model.Tables.embeddings(spark, d).count()
      val (pcaRows, pcaT) = run("sim_pca_power", d)
      emit("probe" -> "sim_pca_power", "dir" -> d, "vecs" -> nVecs,
        "rows" -> pcaRows, "sec" -> pcaT)

      val (c4Rows, c4T) = run("ta_c4_rules", d)
      emit("probe" -> "ta_c4_rules", "dir" -> d, "docs" -> c4Rows, "sec" -> c4T)

      val (abRows, abT) = run("qa_ab_test_gate", d)
      val (bfRows, bfT) = run("qa_benford", d)
      emit("probe" -> "qa_ab_benford", "dir" -> d, "events" -> nEvents,
        "ab_rows" -> abRows, "bf_rows" -> bfRows,
        "sec" -> (abT + bfT))

      val (csvRows, csvT) = run("pipe_csv_flatten", d)
      emit("probe" -> "pipe_csv_flatten", "dir" -> d, "objects" -> csvRows,
        "sec" -> csvT)

      // --- session-10 batches three and four ---

      val (kcRows, kcT) = run("gr_kcore", d)
      emit("probe" -> "gr_kcore", "dir" -> d, "survivors" -> kcRows,
        "sec" -> kcT)

      val qde = QueryCatalog.all.find(_.name == "td_dedup_eval").get
      val (de, deT) = time { qde.fn(spark, d).head() }
      emit("probe" -> "td_dedup_eval", "dir" -> d,
        "n_truth" -> de.getLong(0), "n_pred" -> de.getLong(1),
        "tp" -> de.getLong(2), "sec" -> deT)

      val (fbRows, fbT) = run("ev_forecast_backtest", d)
      emit("probe" -> "ev_forecast_backtest", "dir" -> d, "types" -> fbRows,
        "sec" -> fbT)

      val (afRows, afT) = run("mm_audio_fingerprint", d)
      emit("probe" -> "mm_audio_fingerprint", "dir" -> d, "pairs" -> afRows,
        "sec" -> afT)

      val (fmRows, fmT) = run("ev_feature_matrix", d)
      emit("probe" -> "ev_feature_matrix", "dir" -> d, "labels" -> fmRows,
        "sec" -> fmT)

      val qtp = QueryCatalog.all.find(_.name == "ev_top_paths").get
      val (tp10, tpT) = time {
        qtp.fn(spark, d).agg(sum($"n_sessions")).head().getLong(0)
      }
      emit("probe" -> "ev_top_paths", "dir" -> d, "top10_sessions" -> tp10,
        "sec" -> tpT)

      val (dcRows, dcT) = run("qa_data_contract", d)
      emit("probe" -> "qa_data_contract", "dir" -> d, "rules" -> dcRows,
        "sec" -> dcT)

      // --- session-10 batches six and seven ---

      val (cardRows, cardT) = run("pipe_dataset_card", d)
      emit("probe" -> "pipe_dataset_card", "dir" -> d, "sources" -> cardRows,
        "sec" -> cardT)

      val (rakeRows, rakeT) = run("ta_rake_keyphrases", d)
      emit("probe" -> "ta_rake_keyphrases", "dir" -> d, "rows" -> rakeRows,
        "sec" -> rakeT)

      val (sumRows, sumT) = run("ta_extractive_summary", d)
      emit("probe" -> "ta_extractive_summary", "dir" -> d, "docs" -> sumRows,
        "sec" -> sumT)

      val qas = QueryCatalog.all.find(_.name == "gr_assortativity").get
      val (asr, asT) = time { qas.fn(spark, d).head() }
      emit("probe" -> "gr_assortativity", "dir" -> d,
        "m_directed" -> asr.getLong(0), "r_milli" -> asr.getLong(4),
        "sec" -> asT)

      val (mmrRows, mmrT) = run("sim_mmr_select", d)
      emit("probe" -> "sim_mmr_select", "dir" -> d, "k" -> mmrRows,
        "sec" -> mmrT)

      // kNN graph: the Σ bucket² candidate bound is the claim
      val occ2 = graft.model.Tables.embeddings(spark, d)
        .select(graft.functions.exprs.lsh_bucket($"embedding").as("b"))
        .groupBy($"b").count()
        .agg(expr("cast(sum(count * count) as bigint)")).head.getLong(0)
      val (kgRows, kgT) = run("sim_knn_graph", d)
      emit("probe" -> "sim_knn_graph", "dir" -> d, "vecs" -> nVecs,
        "bucket_occ2" -> occ2, "edges" -> kgRows, "sec" -> kgT)

      val (tfRows, tfT) = run("td_tokenizer_fertility", d)
      emit("probe" -> "td_tokenizer_fertility", "dir" -> d, "langs" -> tfRows,
        "sec" -> tfT)

      // batch 9 — all three are single partial-agg passes; the probe
      // records the agg key volume each one's scale claim rests on
      val nOrders = graft.model.Tables.orders(spark, d).count()
      val (rcRows, rcT) = run("qa_reconciliation", d)
      emit("probe" -> "qa_reconciliation", "dir" -> d, "orders" -> nOrders,
        "rungs" -> rcRows, "sec" -> rcT)

      val (nyRows, nyT) = run("td_neyman_alloc", d)
      emit("probe" -> "td_neyman_alloc", "dir" -> d, "docs" -> nDocs,
        "strata" -> nyRows, "sec" -> nyT)

      val (edRows, edT) = run("sim_embedding_drift", d)
      emit("probe" -> "sim_embedding_drift", "dir" -> d, "vecs" -> nVecs,
        "rows" -> edRows, "sec" -> edT)

      // batch 10 — record the intermediate each entry's claim rests on
      val (hvRows, hvT) = run("ta_heaps_vocab_curve", d)
      emit("probe" -> "ta_heaps_vocab_curve", "dir" -> d, "vocab" -> nNodes,
        "deciles" -> hvRows, "sec" -> hvT)

      val nPostings = toks
        .select($"doc_id", explode($"w").as("t")).distinct().count()
      val (buRows, buT) = run("ta_burstiness_topk", d)
      emit("probe" -> "ta_burstiness_topk", "dir" -> d,
        "postings" -> nPostings, "rows" -> buRows, "sec" -> buT)

      val histSize = graft.model.Tables.events(spark, d)
        .groupBy($"user_id").count()
        .select($"count").distinct().count()
      val (pcRows, pcT) = run("ev_pareto_concentration", d)
      emit("probe" -> "ev_pareto_concentration", "dir" -> d,
        "hist_classes" -> histSize, "rows" -> pcRows, "sec" -> pcT)

      val qhc = QueryCatalog.all.find(_.name == "td_hash_collision_audit").get
      val (hcr, hcT) = time { qhc.fn(spark, d).head() }
      emit("probe" -> "td_hash_collision_audit", "dir" -> d,
        "docs" -> hcr.getLong(1), "buckets" -> hcr.getLong(2),
        "max_bucket" -> hcr.getLong(3), "fp_pairs" -> hcr.getLong(5),
        "sec" -> hcT)

      // batch 11
      val (fkRows, fkT) = run("ta_readability_fk", d)
      emit("probe" -> "ta_readability_fk", "dir" -> d, "docs" -> nDocs,
        "sources" -> fkRows, "sec" -> fkT)

      val (hzRows, hzT) = run("ev_hazard_curve", d)
      emit("probe" -> "ev_hazard_curve", "dir" -> d, "events" -> nEvents,
        "lifetime_classes" -> hzRows, "sec" -> hzT)

      val DayNs2 = 86400L * 1000 * 1000 * 1000
      val nUserDays = graft.model.Tables.events(spark, d)
        .select($"user_id", expr(s"ts div $DayNs2").as("day"))
        .distinct().count()
      val (dwRows, dwT) = run("ev_dau_wau_stickiness", d)
      emit("probe" -> "ev_dau_wau_stickiness", "dir" -> d,
        "user_days" -> nUserDays, "days" -> dwRows, "sec" -> dwT)

      // batch 12
      val (elRows, elT) = run("qa_discount_elasticity", d)
      emit("probe" -> "qa_discount_elasticity", "dir" -> d,
        "tier_pairs" -> elRows, "sec" -> elT)

      val nEdges = graft.model.Tables.lineitem(spark, d)
        .select($"l_partkey", $"l_suppkey").distinct().count()
      val (hiRows, hiT) = run("gr_hits", d)
      emit("probe" -> "gr_hits", "dir" -> d, "edges" -> nEdges,
        "rows" -> hiRows, "sec" -> hiT)

      val (mtRows, mtT) = run("sim_matryoshka_eval", d)
      emit("probe" -> "sim_matryoshka_eval", "dir" -> d, "vecs" -> nVecs,
        "rows" -> mtRows, "sec" -> mtT)

      // batch 13
      val (tcRows, tcT) = run("ev_funnel_time_to_convert", d)
      emit("probe" -> "ev_funnel_time_to_convert", "dir" -> d,
        "events" -> nEvents, "rows" -> tcRows, "sec" -> tcT)

      val (ktRows, ktT) = run("qa_kitagawa_decomposition", d)
      emit("probe" -> "qa_kitagawa_decomposition", "dir" -> d,
        "docs" -> nDocs, "sources" -> ktRows, "sec" -> ktT)

      val qsw = QueryCatalog.all.find(_.name == "td_threshold_sweep").get
      val (swr, swT) = time {
        qsw.fn(spark, d).agg(max($"n_pairs"), max($"n_docs")).head()
      }
      emit("probe" -> "td_threshold_sweep", "dir" -> d,
        "max_pairs" -> swr.getLong(0), "max_docs" -> swr.getLong(1),
        "sec" -> swT)

      // batch 14
      val (bdRows, bdT) = run("ta_burrows_delta", d)
      emit("probe" -> "ta_burrows_delta", "dir" -> d, "tokens" -> nTokens,
        "pairs_out" -> bdRows, "sec" -> bdT)

      val (slRows, slT) = run("qa_ship_lag_quantiles", d)
      emit("probe" -> "qa_ship_lag_quantiles", "dir" -> d,
        "month_quantiles" -> slRows, "sec" -> slT)

      val (iwRows, iwT) = run("geo_idw_surface", d)
      emit("probe" -> "geo_idw_surface", "dir" -> d, "cells" -> iwRows,
        "sec" -> iwT)

      // batch 15
      val (vrRows, vrT) = run("ta_vocab_richness", d)
      emit("probe" -> "ta_vocab_richness", "dir" -> d, "vocab" -> nNodes,
        "rows" -> vrRows, "sec" -> vrT)

      val (rfRows, rfT) = run("ev_rfm_segments", d)
      emit("probe" -> "ev_rfm_segments", "dir" -> d, "events" -> nEvents,
        "cells" -> rfRows, "sec" -> rfT)

      val qsp = QueryCatalog.all.find(_.name == "qa_simpson_paradox").get
      val (spr, spT) = time {
        qsp.fn(spark, d).agg(count(lit(1)), sum($"simpson_flag")).head()
      }
      emit("probe" -> "qa_simpson_paradox", "dir" -> d,
        "year_pairs" -> spr.getLong(0), "flags" -> spr.getLong(1),
        "sec" -> spT)

      // batch 16
      val qph = QueryCatalog.all.find(_.name == "mm_phash_hamming_hist").get
      val (phr, phT) = time {
        qph.fn(spark, d).agg(count(lit(1)), max($"cum_pairs")).head()
      }
      emit("probe" -> "mm_phash_hamming_hist", "dir" -> d,
        "classes" -> phr.getLong(0), "cand_pairs" -> phr.getLong(1),
        "sec" -> phT)

      val (ppRows, ppT) = run("gr_personalized_pagerank", d)
      emit("probe" -> "gr_personalized_pagerank", "dir" -> d,
        "rows" -> ppRows, "sec" -> ppT)

      val qpv = QueryCatalog.all.find(_.name == "ta_postings_varint_size").get
      val (pvr, pvT) = time {
        qpv.fn(spark, d)
          .agg(count(lit(1)), sum($"n_gaps"), sum($"total_bytes")).head()
      }
      emit("probe" -> "ta_postings_varint_size", "dir" -> d,
        "classes" -> pvr.getLong(0), "postings" -> pvr.getLong(1),
        "bytes" -> pvr.getLong(2), "sec" -> pvT)

      // batch 17
      val (usRows, usT) = run("td_uncertainty_sample", d)
      emit("probe" -> "td_uncertainty_sample", "dir" -> d, "docs" -> nDocs,
        "batch" -> usRows, "sec" -> usT)

      val qap = QueryCatalog.all.find(_.name == "ev_attribution_position").get
      val (apr, apT) = time {
        qap.fn(spark, d)
          .agg(sum($"n_touchpoints"), sum($"credit_ppm_total")).head()
      }
      emit("probe" -> "ev_attribution_position", "dir" -> d,
        "pairs" -> apr.getLong(0), "credit_total" -> apr.getLong(1),
        "sec" -> apT)

      val (dsRows, dsT) = run("qa_dow_seasonality", d)
      emit("probe" -> "qa_dow_seasonality", "dir" -> d, "events" -> nEvents,
        "dows" -> dsRows, "sec" -> dsT)

      // batch 18
      val (ssRows, ssT) = run("mm_silence_segments", d)
      emit("probe" -> "mm_silence_segments", "dir" -> d, "clips" -> ssRows,
        "sec" -> ssT)

      val (kcsRows, kcsT) = run("sim_kcenter_coreset", d)
      emit("probe" -> "sim_kcenter_coreset", "dir" -> d, "vecs" -> nVecs,
        "centers" -> kcsRows, "sec" -> kcsT)
    }
    spark.stop()
  }
}
