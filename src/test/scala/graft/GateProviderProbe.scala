package graft

import org.apache.spark.sql.SparkSession

/** State-store grow-state re-probe INSIDE the real gate path (the
  * round-8 ask #6 carried through round 9): runs
  * `ev_stream_dedup_xbatch` with NO provider pin, so the gate's own
  * data-proportional `gateProvider` decides, and reports the provider
  * the gate body actually ran under (via
  * `EventQueries.lastGateProvider`) next to the wall time. At
  * grow_sf10 (≥64 MiB events fixture) the row must say rocksdb —
  * that is the evidence round 8's `StateStoreProbe` bracket (which
  * pinned both arms explicitly) could not give.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2 SPARK_DRIVER_MEM=48g \
  *     sbt "Test/runMain graft.GateProviderProbe"
  */
object GateProviderProbe {
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
    val q = QueryCatalog.all.find(_.name == "ev_stream_dedup_xbatch").get

    for (d <- dirs) {
      try {
        val t0 = System.nanoTime()
        val rows = q.fn(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val prov = graft.operators.EventQueries.lastGateProvider
          .map(_.split("\\.").last).getOrElse("HDFSBackedStateStoreProvider(default)")
        println(f"""{"probe":"gate_provider","dir":"$d","provider":"$prov","rows":$rows,"sec":$sec%.1f}""")
      } catch {
        case e: Throwable =>
          println(s"""{"probe":"gate_provider","dir":"$d","error":"${
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\n\\r]", " ").take(160)}"}""")
      }
      System.out.flush()
    }
    spark.stop()
  }
}
