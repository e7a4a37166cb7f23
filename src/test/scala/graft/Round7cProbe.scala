package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grown-corpus scaling probe for the round-7 session-3 additions:
  *
  *   - td_dsir_importance: the model is 256 rows BY CONSTRUCTION at
  *     any corpus size, so the quantities that scale are the gram
  *     stream (∝ tokens) and the doc-keyed aggregate (∝ docs). The
  *     probe records both plus wall time — the expected runtime
  *     exponent is ~1.0/decade (map + broadcast probe + one partial
  *     agg shuffle).
  *   - td_softdedup_weights: rides the already-probed
  *     td_dedup_clusters LSH/pointer-jumping path; the DELTA this
  *     probe isolates is the weight join + per-source roll-up, so it
  *     times the cluster stage and the full query separately.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.Round7cProbe"
  */
object Round7cProbe {
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

    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = body
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def run(name: String, d: String): (Long, Double) = {
      val q = QueryCatalog.all.find(_.name == name).get
      time(q.fn(spark, d).count())
    }

    for (d <- dirs) {
      val docs = graft.model.Tables.documents(spark, d)
      val nDocs = docs.count()
      val nGrams = docs
        .select(sum(greatest(size(split($"text", " ")) - 1, lit(0))))
        .as[Long].head()
      val (dsirRows, dsirSec) = run("td_dsir_importance", d)

      val (clusterRows, clusterSec) = run("td_dedup_clusters", d)
      val (sdRows, sdSec) = run("td_softdedup_weights", d)

      println(
        s"""{"probe":"round7c","dir":"$d","n_docs":$nDocs,"n_grams":$nGrams,""" +
        f""""dsir_rows":$dsirRows,"dsir_sec":$dsirSec%.3f,""" +
        f""""cluster_rows":$clusterRows,"cluster_sec":$clusterSec%.3f,""" +
        f""""softdedup_rows":$sdRows,"softdedup_sec":$sdSec%.3f}""")
    }
    spark.stop()
  }
}
