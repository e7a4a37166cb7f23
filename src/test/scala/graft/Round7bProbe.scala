package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grown-corpus scaling probe for the round-7 session-2 additions:
  * per corpus dir, each operator's input volume, the size of the
  * intermediate that could go superlinear (flagged span rows for the
  * coverage operators; nothing for the packer and sketch, whose
  * intermediates are fixed by construction), output rows, and wall
  * time — the evidence that the shapes hold when documents grow
  * 10–100× with grown vocab/source domains.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.Round7bProbe"
  */
object Round7bProbe {
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

    def time(name: String)(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = body
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def run(name: String, d: String): (Long, Double) = {
      val q = QueryCatalog.all.find(_.name == name).get
      time(name)(q.fn(spark, d).count())
    }

    for (d <- dirs) {
      val docs = graft.model.Tables.documents(spark, d)
      val nDocs = docs.count()
      val nTokens = docs.select(sum(size(split($"text", " "))))
        .as[Long].head()

      // span dedup: the flagged-row volume is the scale risk (a
      // universally-common 8-gram would flag every position)
      val spanGrams = docs
        .select($"doc_id",
          explode(sequence(lit(1), greatest(size(split($"text", " ")) - 7, lit(0)))).as("pos"),
          split($"text", " ").as("w"))
        .select($"doc_id", md5(array_join(slice($"w", $"pos", lit(8)), " ")).as("g"))
      val spanFlagged = spanGrams
        .join(spanGrams.groupBy($"g").agg(countDistinct($"doc_id").as("nd"))
          .filter($"nd" >= 2).select($"g"), "g")
        .count()
      val (spanRows, spanSec) = run("td_span_dedup", d)

      // boilerplate: the per-source boilerplate set size bounds the
      // broadcast + flag-join volume
      val bigrams = docs
        .select($"doc_id", $"source",
          explode(sequence(lit(1), greatest(size(split($"text", " ")) - 1, lit(0)))).as("pos"),
          split($"text", " ").as("w"))
        .select($"doc_id", $"source",
          md5(array_join(slice($"w", $"pos", lit(2)), " ")).as("g"))
      val nd = docs.groupBy($"source").agg(count(lit(1)).as("nd"))
      val boilerSet = bigrams.select($"source", $"g", $"doc_id").distinct()
        .groupBy($"source", $"g").agg(count(lit(1)).as("df"))
        .join(nd, "source").filter($"df" * 5 >= $"nd").count()
      val (boilRows, boilSec) = run("ta_boilerplate_strip", d)

      val (packRows, packSec) = run("td_sequence_pack", d)

      val nLine = graft.model.Tables.lineitem(spark, d).count()
      val (cmsRows, cmsSec) = run("qa_cms_heavy_hitters", d)
      val (chunkRows, chunkSec) = run("td_chunk_overlap", d)
      val nVecs = graft.model.Tables.embeddings(spark, d).count()
      val (hnRows, hnSec) = run("sim_hard_negatives", d)

      println(
        s"""{"probe":"round7b","dir":"$d","n_docs":$nDocs,"n_tokens":$nTokens,""" +
        s""""span_flagged":$spanFlagged,"span_rows":$spanRows,""" +
        f""""span_sec":$spanSec%.3f,""" +
        s""""boiler_set":$boilerSet,"boiler_rows":$boilRows,""" +
        f""""boiler_sec":$boilSec%.3f,""" +
        f""""pack_rows":$packRows,"pack_sec":$packSec%.3f,""" +
        f""""lineitem_rows":$nLine,"cms_rows":$cmsRows,"cms_sec":$cmsSec%.3f,""" +
        f""""chunk_rows":$chunkRows,"chunk_sec":$chunkSec%.3f,""" +
        f""""n_vecs":$nVecs,"hn_rows":$hnRows,"hn_sec":$hnSec%.3f}""")
    }
    spark.stop()
  }
}
