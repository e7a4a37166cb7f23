package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume probe for the data-proportional pHash band
  * geometry: runs mm_phash_neardup on each corpus twice — once at the
  * auto-derived geometry (knob-free) and once forced back to the
  * 4×16 catalogue layout — and records emitted pair rows, true
  * near-dup rows (hamming ≤ 3), and wall time. The pigeonhole
  * guarantee makes the near-dup set identical at ANY valid geometry;
  * the delta is pure uniform-collision noise, which the derived width
  * is meant to keep ∝ n.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.PhashGeomProbe"
  */
object PhashGeomProbe {
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

    val q = QueryCatalog.all.find(_.name == "mm_phash_neardup").get
    def run(d: String): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val out = q.fn(spark, d)
        .agg(count(lit(1)), sum(when($"is_near_dup", 1L).otherwise(0L)))
        .as[(Long, Long)].head()
      (out._1, out._2, (System.nanoTime() - t0) / 1e9)
    }

    for (d <- dirs) {
      val nDocs = graft.model.Tables.documents(spark, d).count()
      val (bandsAuto, bitsAuto) = graft.operators.Multimodal.phashGeometry(nDocs)
      val (autoRows, autoDups, autoSec) = run(d)
      val (fixedRows, fixedDups, fixedSec) = try {
        sys.props("graft.phash.bits") = "16"
        run(d)
      } finally sys.props.remove("graft.phash.bits")
      println(
        s"""{"probe":"phash_geom","dir":"$d","n_docs":$nDocs,""" +
        s""""auto_geom":"${bandsAuto}x$bitsAuto","auto_rows":$autoRows,""" +
        f""""auto_neardups":$autoDups,"auto_sec":$autoSec%.3f,""" +
        s""""fixed_rows":$fixedRows,"fixed_neardups":$fixedDups,""" +
        f""""fixed_sec":$fixedSec%.3f}""")
    }
    spark.stop()
  }
}
