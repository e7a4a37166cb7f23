package graft

import org.apache.spark.sql.SparkSession

/** ANN recall table (round-7 #8): recall@10 vs brute-force cosine on
  * a grown corpus, for IVF-probe at nprobe ∈ {1,2,4} and PQ-ADC at
  * codes ∈ {8,16}, averaged over a fixed query set. Prints one JSON
  * line per (method, knob) with mean recall, mean candidate fraction
  * (IVF), and wall time for the query set.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/growsf1 sbt "Test/runMain graft.AnnRecallProbe"
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/growsf1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.exprs.register(spark)
    import graft.operators.SimilarityQueries._

    val n = graft.model.Tables.embeddings(spark, d).count()
    // spread the query set across the id range so one cell's
    // neighborhood doesn't dominate the average
    val queryIds = (0 until nQueries).map(i => i * (n / nQueries))

    def recall(truth: Seq[Long], got: Seq[Long]): Double =
      truth.toSet.intersect(got.toSet).size.toDouble / truth.size

    val t0 = System.nanoTime()
    val truths = queryIds.map(q => q -> bruteTopKIds(spark, d, q)).toMap
    val bruteSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"ann_recall","dir":"$d","method":"brute","n":$n,""" +
      f""""queries":$nQueries,"recall_at_10":1.0,"sec":$bruteSec%.1f}""")

    val assigned = ivfAssigned(spark, d, kCents = 8)
    for (nprobe <- Seq(1, 2, 4)) {
      val t = System.nanoTime()
      val rs = queryIds.map { q =>
        val (ids, nc) = ivfTopKIds(spark, d, assigned, 8, nprobe, q)
        (recall(truths(q), ids), nc)
      }
      val sec = (System.nanoTime() - t) / 1e9
      val meanR = rs.map(_._1).sum / rs.size
      val meanFrac = rs.map(_._2).sum.toDouble / rs.size / n
      println(f"""{"probe":"ann_recall","dir":"$d","method":"ivf","k":8,""" +
        f""""nprobe":$nprobe,"recall_at_10":$meanR%.3f,""" +
        f""""cand_frac":$meanFrac%.3f,"sec":$sec%.1f}""")
    }

    // LSH single- vs multi-probe (round-8): recall AND candidate cost,
    // so the second probe's price is a recorded number
    for (multiProbe <- Seq(false, true)) {
      val t = System.nanoTime()
      val rs = queryIds.map { q =>
        val (ids, nc) = lshTopKIds(spark, d, q, multiProbe)
        (recall(truths(q), ids), nc)
      }
      val sec = (System.nanoTime() - t) / 1e9
      val meanR = rs.map(_._1).sum / rs.size
      val meanFrac = rs.map(_._2).sum.toDouble / rs.size / n
      println(f"""{"probe":"ann_recall","dir":"$d","method":"lsh",""" +
        f""""probes":${if (multiProbe) 2 else 1},"recall_at_10":$meanR%.3f,""" +
        f""""cand_frac":$meanFrac%.3f,"sec":$sec%.1f}""")
    }

    for ((codes, shortMult) <- Seq((8, 3), (16, 3), (16, 30))) {
      val t = System.nanoTime()
      val rs = queryIds.map(q =>
        recall(truths(q), pqTopKIds(spark, d, codes, q, shortMult = shortMult)))
      val sec = (System.nanoTime() - t) / 1e9
      println(f"""{"probe":"ann_recall","dir":"$d","method":"pq","codes":$codes,""" +
        f""""shortlist":${shortMult * 10},""" +
        f""""recall_at_10":${rs.sum / rs.size}%.3f,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
