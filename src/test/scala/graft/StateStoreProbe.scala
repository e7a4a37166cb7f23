package graft

import org.apache.spark.sql.SparkSession

/** State-store provider A/B for the heaviest streaming gate (round-7
  * #7): ev_stream_dedup_xbatch carries the largest state (every
  * event_id keyed) — at grow_sf10 it was 153 s on the default
  * HDFS-backed store, and the round-6 "RocksDB 20% slower, kept off"
  * measurement was taken at gate (sf0.1) sizes. This probe re-runs
  * the gate at the grown sizes under both providers, same JVM, reps
  * alternated so neither arm owns the warm-up.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "Test/runMain graft.StateStoreProbe"
  */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Both arms pin their provider EXPLICITLY (the gate default is
    // now data-proportional — absence of the conf no longer means
    // HDFS above the 64 MiB crossover).
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val hdfs = s"$provKey=" +
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val rocks = s"$provKey=" +
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val q = QueryCatalog.all.find(_.name == "ev_stream_dedup_xbatch").get

    for (rep <- 1 to reps; (label, conf) <- Seq("hdfs" -> hdfs, "rocksdb" -> rocks)) {
      sys.props("graft.stream.conf") = conf
      try {
        val t0 = System.nanoTime()
        val rows = q.fn(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"state_store","dir":"$d","provider":"$label","rep":$rep,"rows":$rows,"sec":$sec%.1f}""")
      } finally sys.props.remove("graft.stream.conf")
      System.out.flush()
    }
    spark.stop()
  }
}
