package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-data operators that have no SQL oracle:
  * the LSH-bucketed ANN (checked against the brute-force baseline) and
  * the typed multimodal decode plumbing.
  */
class TrainingDataSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("LSH ANN candidates are genuine same-bucket neighbours with decent recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ann = SimilarityQueries.all.find(_.name == "sim_lsh_ann_topk").get
      .fn(spark, sf).collect()
    assert(ann.nonEmpty)
    // every probe appears with ranks 1..k and no self-matches
    val byProbe = ann.groupBy(_.getLong(0))
    byProbe.foreach { case (probe, rows) =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
      assert(rows.forall(_.getLong(2) != probe))
    }
    // sanity recall: ANN top-1 of probe 0 must rank in the top half of
    // the exact cosine ordering (buckets keep nearby vectors together
    // far better than random)
    val emb = graft.model.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Array[Double])].collect().toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / math.sqrt(na * nb)
    }
    byProbe.foreach { case (probe, rows) =>
      val exact = emb.keys.filter(_ != probe).toSeq
        .sortBy(c => -cosine(emb(probe), emb(c)))
      val annTop = rows.minBy(_.getInt(1)).getLong(2)
      val rank = exact.indexOf(annTop)
      assert(rank >= 0 && rank < exact.size / 2,
        s"probe $probe: ANN top-1 $annTop has exact rank $rank of ${exact.size}")
    }
  }

  test("multimodal decode keeps schema, determinism, and batch shape") {
    val media = Multimodal.asMedia(spark, sf)
    val decoded = Multimodal.decode(media)
    val rows = decoded.collect()
    assert(rows.length == media.count())
    assert(rows.forall(r => r.width >= 64 && r.width <= 319))
    assert(rows.forall(r => Set("png", "jpeg", "webp").contains(r.format)))
    // determinism: same payload → same decode
    val again = Multimodal.decode(media).collect()
    assert(rows.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
    // plumbing survives a repartition (decode is per-partition)
    val repart = Multimodal.decode(media.repartition(7)).collect()
    assert(repart.map(_.doc_id).sorted.sameElements(rows.map(_.doc_id).sorted))
  }
}
