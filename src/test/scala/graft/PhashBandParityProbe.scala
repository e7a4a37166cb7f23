package graft

import org.apache.spark.sql.SparkSession

/** Dumps the Spark-side adaptive pHash band values (doc_id, b0..b3 at
  * Multimodal.phashGeometry(count)) for a corpus so
  * tools/phash_band_parity.py can equality-join them against the
  * oracle CTE's bands in DuckDB. The full all-pairs oracle replay is
  * quadratic (infeasible past ~100k docs); band VALUES are the only
  * surface that changes with corpus size, so row-by-row band parity +
  * the sf0.01 full-oracle pass together gate the adaptive geometry at
  * grow scale.
  *
  *   sbt "Test/runMain graft.PhashBandParityProbe <sfDir> <outDir>"
  *   python3 tools/phash_band_parity.py <outDir> <sfDir>/documents.parquet
  */
object PhashBandParityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/testdata/grow_sf10")
    val out = args.lift(1).getOrElse("/tmp/phash_bands")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val docs = graft.model.Tables.documents(spark, sfDir)
    val (nb, wb) = graft.operators.Multimodal.phashGeometry(docs.count())
    println(s"[phash-band-parity] geometry ${nb}x$wb")
    docs
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val b = graft.operators.Multimodal.pHashBandValues(payload, nb, wb)
          (id, b(0), b(1), b(2), b(3))
        }
      }
      .toDF("doc_id", "b0", "b1", "b2", "b3")
      .write.mode("overwrite").parquet(out)
    println(s"[phash-band-parity] wrote $out")
    spark.stop()
  }
}
