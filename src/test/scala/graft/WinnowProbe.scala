package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grown-corpus scaling probe for td_winnow_neardup (round-7 #2):
  * per corpus dir, the fingerprint volume, the candidate-pair volume
  * Σ df·(df−1)/2 with the posting cap OFF and at the scale-default
  * cap (128), the emitted pair count, and wall time — the evidence
  * that the inverted-fingerprint index keeps candidates ∝ n while
  * the uncapped Σdf² grows faster.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.WinnowProbe"
  */
object WinnowProbe {
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

    for (d <- dirs) {
      val nDocs = graft.model.Tables.documents(spark, d).count()
      val fps = graft.model.Tables.documents(spark, d)
        .select($"doc_id",
          explode(graft.functions.exprs.winnow_fingerprints($"text", 3, 4)).as("fp"))
      val df = fps.groupBy($"fp").agg(count(lit(1)).as("df")).cache()
      val Array(nFps, candUncapped, cand128) = df
        .agg(sum($"df"), sum(expr("df * (df - 1) div 2")),
          sum(when($"df" <= 128, expr("df * (df - 1) div 2")).otherwise(0L)))
        .as[(Long, Long, Long)].head() match {
          case (a, b, c) => Array(a, b, c)
        }
      df.unpersist()
      val q = graft.QueryCatalog.all.find(_.name == "td_winnow_neardup").get
      val t0 = System.nanoTime()
      val out = q.fn(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"probe":"winnow_neardup","dir":"$d","n_docs":$nDocs,"fp_rows":$nFps,""" +
        s""""cand_uncapped":$candUncapped,"cand_df128":$cand128,""" +
        f""""out_rows":$out,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
