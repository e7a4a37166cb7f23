package graft

import org.apache.spark.sql.SparkSession

/** Round-10 grown-corpus probe (the same harness shape as
  * Round9Probe): one JSONL row per (query, dir) with wall time and
  * result rows. Default name set = the round-10 perf targets
  * (gr_link_predict anti-join widening, gr_katz_centrality fused
  * hops, gr_modularity shared artifacts, the coPurchaseKept sized
  * construction consumers), the drifted-trio re-probe, and
  * pipe_end_to_end's first decade row.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2,d3 sbt "Test/runMain graft.Round10Probe"
  *   SPARK_GRAFT_PROBE_NAMES=a,b  restricts the set.
  */
object Round10Probe {
  val Names: Seq[String] = Seq(
    "gr_katz_centrality", "gr_link_predict", "gr_modularity",
    "gr_triangle_count", "gr_truss_support", "gr_clustering_coeff",
    "gr_kcore", "gr_assortativity", "gr_basket_lift",
    "mm_phash_clusters", "pipe_end_to_end", "geo_union_area",
    "pipe_compaction_bins",
  )

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1"))
    // Resolve requested names against the FULL catalogue (not just the
    // default probe set) and fail loudly on names matching nothing —
    // a silent filter-to-default made a typo'd probe look successful
    // while measuring nothing.
    val names = sys.env.get("SPARK_GRAFT_PROBE_NAMES")
      .map { raw =>
        val req = raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val known = QueryCatalog.all.map(_.name).toSet
        val unknown = req.filterNot(known)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_PROBE_NAMES entries not in QueryCatalog: " +
            unknown.mkString(", "))
        req
      }
      .getOrElse(Names)
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

    for (d <- dirs; name <- names) {
      val q = QueryCatalog.all.find(_.name == name).get
      try {
        val t0 = System.nanoTime()
        val rows = q.fn(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"$name","dir":"$d","rows":$rows,"sec":$sec%.2f}""")
      } catch {
        case e: Throwable =>
          println(s"""{"probe":"$name","dir":"$d","error":"${
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\n\\r]", " ").take(160)}"}""")
      }
      System.out.flush()
    }
    spark.stop()
  }
}
