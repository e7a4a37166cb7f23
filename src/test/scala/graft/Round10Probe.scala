package graft

/** Round-10 grown-corpus probe: the curated default name set for the
  * round-10 perf targets (gr_link_predict anti-join widening,
  * gr_katz_centrality fused hops, gr_modularity shared artifacts, the
  * coPurchaseKept sized construction consumers), the drifted-trio
  * re-probe, and pipe_end_to_end's first decade row. The harness
  * itself (session, loop, JSONL escaping, loud name resolution) lives
  * once in [[ProbeMain]]; this main only supplies the default set.
  *
  *   SPARK_GRAFT_SF_DIRS=d1,d2,d3 sbt "Test/runMain graft.Round10Probe"
  *   SPARK_GRAFT_PROBE_NAMES=a,b  overrides the set (resolved against
  *   the FULL catalogue; unknown names abort loudly).
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
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1"))
    val names = sys.env.get("SPARK_GRAFT_PROBE_NAMES")
      .map(ProbeMain.resolveNames).getOrElse(Names)
    ProbeMain.run(names, dirs)
  }
}
