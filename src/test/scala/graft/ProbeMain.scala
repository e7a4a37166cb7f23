package graft

import org.apache.spark.sql.SparkSession

/** Generic grown-corpus probe: one JSONL row per (query, dir) with
  * wall time and result rows, for ANY catalogue query. This is the
  * JVM half of the paired-A/B protocol (tools/ab_paired.sh) — the
  * script alternates invocations of this main between two checkouts
  * and compares per-query minima, which is the only comparison that
  * survives this host's measured 2.2× cross-session drift.
  *
  *   SPARK_GRAFT_PROBE_NAMES=a,b \
  *   SPARK_GRAFT_SF_DIRS=d1,d2 sbt "Test/runMain graft.ProbeMain"
  *
  * Names are REQUIRED and resolved against the full catalogue; an
  * unknown name aborts loudly (a silent filter once made a typo'd
  * probe look successful while measuring nothing).
  *
  * NOTE for ab_paired.sh: this file depends only on [[QueryCatalog]]
  * and graft.functions.exprs, both stable since round 3, so the
  * script can copy it verbatim into a baseline worktree that predates
  * it.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1"))
    val raw = sys.env.getOrElse("SPARK_GRAFT_PROBE_NAMES",
      sys.error("SPARK_GRAFT_PROBE_NAMES is required for ProbeMain"))
    val names = raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val known = QueryCatalog.all.map(_.name).toSet
    val unknown = names.filterNot(known)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_PROBE_NAMES entries not in QueryCatalog: " +
        unknown.mkString(", "))
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
