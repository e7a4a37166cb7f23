package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grown-corpus scaling probe for the round-7 session-8 additions:
  *
  *   - td_incremental_dedup: the scale claim is that the probe join's
  *     candidate pairs grow with the BATCH (20% of docs here) times
  *     bucket collision rate, never corpus² — the probe records the
  *     candidate-pair count next to wall time so the exponent is
  *     measured, not argued.
  *   - ta_hashed_classifier: one in-row projection — expected ~linear
  *     in tokens with a flat floor.
  *   - pipe_drop_audit: composes exact-dedup + CCNet + the LSH/CC
  *     cluster stage; times the dominant cluster stage separately so
  *     the audit's DELTA (three doc-keyed joins) is visible.
  *   - sim_sq_topk: embeddings grow ~4×/decade; records recall@10 vs
  *     the exact L2 top-10 at each size alongside wall time.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.Round7gProbe"
  */
object Round7gProbe {
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

    for (d <- dirs) {
      val docs = graft.model.Tables.documents(spark, d)
      val nDocs = docs.count()

      // candidate-pair count of the incremental probe join, measured
      // the same way the query builds it (bands → probe join)
      val bands = graft.operators.DedupQueries.minhashBandsDf(spark, d)
        .withColumn("is_new", $"doc_id" % 5 === 0)
        .localCheckpoint()
      val probe = bands.filter($"is_new")
        .select($"doc_id".as("new_id"), $"band", $"band_sig")
      val index = bands.select($"doc_id".as("other_id"),
        $"is_new".as("other_new"), $"band", $"band_sig")
      val (nCand, candSec) = time(
        probe.join(index, Seq("band", "band_sig"))
          .filter($"other_id" =!= $"new_id" &&
            (!$"other_new" || $"other_id" < $"new_id"))
          .select($"new_id", $"other_id").distinct().count())

      val (incRows, incSec) = run("td_incremental_dedup", d)
      val (clsRows, clsSec) = run("ta_hashed_classifier", d)
      val (clusterRows, clusterSec) = run("td_dedup_clusters", d)
      val (auditRows, auditSec) = run("pipe_drop_audit", d)

      // SQ recall vs exact L2 at this corpus size
      import graft.functions.exprs.sq_dist_e9
      val emb = graft.model.Tables.embeddings(spark, d)
      val nVecs = emb.count()
      val qe = emb.filter($"vec_id" === 0).select($"embedding")
        .as[Seq[Float]].head().toArray
      val exact = emb.filter($"vec_id" =!= 0)
        .select($"vec_id", sq_dist_e9($"embedding", typedLit(qe.toSeq), 0).as("dd"))
        .orderBy($"dd", $"vec_id").limit(10)
        .select($"vec_id").as[Long].collect().toSet
      val qSq = QueryCatalog.all.find(_.name == "sim_sq_topk").get
      val (sqIds, sqSec) = time(
        qSq.fn(spark, d).select("vec_id").as[Long].collect())
      val recall = sqIds.toSet.intersect(exact).size

      println(
        s"""{"probe":"round7g","dir":"$d","n_docs":$nDocs,""" +
          s""""inc_candidates":$nCand,"cand_sec":${f"$candSec%.3f"},""" +
          s""""inc_rows":$incRows,"inc_sec":${f"$incSec%.3f"},""" +
          s""""classifier_rows":$clsRows,"classifier_sec":${f"$clsSec%.3f"},""" +
          s""""cluster_sec":${f"$clusterSec%.3f"},""" +
          s""""audit_rows":$auditRows,"audit_sec":${f"$auditSec%.3f"},""" +
          s""""n_vecs":$nVecs,"sq_recall10":$recall,"sq_sec":${f"$sqSec%.3f"}}""")
    }
    spark.stop()
  }
}
