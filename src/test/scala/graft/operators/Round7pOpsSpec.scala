package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 session-10 batch eight: the kNN graph
  * reconciled against the gated LSH-ANN (the probe sample must get
  * identical neighbours from both), and tokenizer fertility
  * reconciled against the gated BPE-encode per-doc accounting.
  */
class Round7pOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.exprs.register(s)
    s
  }

  private def q(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get

  test("sim_knn_graph: the probe rows coincide with sim_lsh_ann_topk exactly") {
    import spark.implicits._
    val graph = q("sim_knn_graph").fn(spark, sf)
      .as[(Long, Int, Long, Long)].collect()
    val ann = q("sim_lsh_ann_topk").fn(spark, sf)
      .as[(Long, Int, Long)].collect()
    val graphProbes = graph.filter(_._1 < 10).map(r => (r._1, r._2, r._3))
    assert(graphProbes.toSeq == ann.toSeq)
    // graph-wide sanity: ranks are 1..3 per node, cosines descend
    graph.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
    }
    assert(graph.length > ann.length) // the graph covers far more nodes
  }

  test("td_tokenizer_fertility: per-lang roll-up of the gated BPE accounting") {
    import spark.implicits._
    val got = q("td_tokenizer_fertility").fn(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    // reconcile against ta_bpe_encode's per-doc (tokens, pieces)
    val byDoc = q("ta_bpe_encode").fn(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_bpe_pieces")
      .as[(Long, Long, Long)].collect()
    val langs = graft.model.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val naive = byDoc.groupBy(r => langs(r._1)).toSeq.sortBy(_._1)
      .map { case (lang, rows) =>
        val t = rows.map(_._2).sum; val p = rows.map(_._3).sum
        (lang, t, p, p * 1000000 / t)
      }
    assert(got.toSeq == naive)
    assert(got.forall(_._4 > 1000000)) // fertility > 1 piece per word
  }
}
