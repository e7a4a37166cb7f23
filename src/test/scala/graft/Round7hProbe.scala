package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grown-corpus scaling probe for the round-7 session-9 additions.
  * Each row records wall time PLUS the intermediate cardinality the
  * entry's scale argument rests on, so the claimed exponents are
  * measured rather than argued:
  *
  *   - ta_ngram_novelty: (gram, doc) pair rows and distinct grams —
  *     the df shuffle's actual volume (claim: ∝ corpus tokens);
  *   - qa_skyline_pareto: the per-x reduced set (what the two-phase
  *     cummax actually sorts — claim: ≤ |domain(n_chars)|, NOT ∝ n)
  *     and the frontier size;
  *   - sim_gram_matrix: vector count n; output is 2080 rows at any n,
  *     shuffle rows ≤ tasks·2080 (claim: time ∝ n, memory flat);
  *   - sim_recall_mrr_eval: brute-force leg is |probes|·n kernels
  *     (claim: ∝ n with a fixed probe sample) + mean recall@3;
  *   - ta_gopher_rules: map-only (claim: ∝ n, zero shuffle);
  *   - ev_ivm_merge: merge input is 2 rows/user (claim: ∝ events for
  *     the partials, ∝ users for the merge);
  *   - qa_k_anonymity: QI-group cardinality (claim: bounded by the QI
  *     domain, so the joined-back aggregates broadcast at any n).
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.Round7hProbe"
  */
object Round7hProbe {
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
      val nVecs = graft.model.Tables.embeddings(spark, d).count()

      // novelty: the df shuffle's real volume
      val gramPairs = docs
        .select($"doc_id", split($"text", " ").as("w"))
        .filter(size($"w") >= 5)
        .select($"doc_id",
          explode(transform(sequence(lit(1), size($"w") - 4), p =>
            md5(array_join(slice($"w", p, lit(5)), " ")))).as("g"))
        .distinct()
      val nPairs = gramPairs.count()
      val nGrams = gramPairs.select($"g").distinct().count()
      val (novRows, novT) = run("ta_ngram_novelty", d)
      emit("probe" -> "ta_ngram_novelty", "dir" -> d, "docs" -> nDocs,
        "gram_doc_pairs" -> nPairs, "distinct_grams" -> nGrams,
        "rows" -> novRows, "sec" -> novT)

      // skyline: reduced-set size vs corpus size
      val nX = docs.select($"n_chars").distinct().count()
      val (skyRows, skyT) = run("qa_skyline_pareto", d)
      emit("probe" -> "qa_skyline_pareto", "dir" -> d, "docs" -> nDocs,
        "distinct_x" -> nX, "frontier" -> skyRows, "sec" -> skyT)

      val (gramRows, gramT) = run("sim_gram_matrix", d)
      emit("probe" -> "sim_gram_matrix", "dir" -> d, "vecs" -> nVecs,
        "rows" -> gramRows, "sec" -> gramT)

      val q = QueryCatalog.all.find(_.name == "sim_recall_mrr_eval").get
      val (ev, evalT) = time {
        q.fn(spark, d).agg(sum($"n_hits"), count(lit(1))).head()
      }
      emit("probe" -> "sim_recall_mrr_eval", "dir" -> d, "vecs" -> nVecs,
        "total_hits" -> ev.getLong(0), "probes" -> ev.getLong(1),
        "sec" -> evalT)

      val (gr, gopherT) = time {
        QueryCatalog.all.find(_.name == "ta_gopher_rules").get
          .fn(spark, d).agg(sum($"keep"), count(lit(1))).head()
      }
      emit("probe" -> "ta_gopher_rules", "dir" -> d, "docs" -> nDocs,
        "kept" -> gr.getLong(0), "sec" -> gopherT)

      val (ivmRows, ivmT) = run("ev_ivm_merge", d)
      emit("probe" -> "ev_ivm_merge", "dir" -> d,
        "events" -> graft.model.Tables.events(spark, d).count(),
        "users" -> ivmRows, "sec" -> ivmT)

      val nQi = graft.model.Tables.customer(spark, d)
        .select($"c_nationkey", $"c_mktsegment").distinct().count()
      val (kRows, kT) = run("qa_k_anonymity", d)
      emit("probe" -> "qa_k_anonymity", "dir" -> d, "customers" -> kRows,
        "qi_groups" -> nQi, "sec" -> kT)
    }
    spark.stop()
  }
}
