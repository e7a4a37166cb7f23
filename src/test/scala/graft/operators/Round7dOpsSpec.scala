package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 session-4 additions, each checked against an
  * independently-computed naive baseline over the same raw rows (the
  * oracle gate hashes values; these fail with a value diff instead).
  */
class Round7dOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

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

  // ---- gr_bfs_hops: frontier BFS vs naive queue BFS ----

  test("gr_bfs_hops matches a naive in-memory BFS, including early exit") {
    import spark.implicits._
    val got = q("gr_bfs_hops").fn(spark, sf)
      .as[(Long, Int)].collect().toMap

    val edges = graft.model.Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey").as[(Long, Long)].collect()
      .flatMap { case (p, sup) =>
        val (a, b) = (p * 2, sup * 2 + 1)
        Seq(a -> b, b -> a)
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = graft.model.Tables.supplier(spark, sf)
      .filter($"s_nationkey" === 0)
      .select($"s_suppkey").as[Long].collect().map(_ * 2 + 1).toSet

    val dist = collection.mutable.Map(seeds.toSeq.map(_ -> 0): _*)
    var frontier = seeds
    var round = 1
    while (round <= 4 && frontier.nonEmpty) {
      val next = frontier.flatMap(n => edges.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      next.foreach(n => dist(n) = round)
      frontier = next
      round += 1
    }
    assert(got.size == dist.size, s"node count ${got.size} vs ${dist.size}")
    dist.foreach { case (n, h) =>
      assert(got.get(n).contains(h), s"node $n: engine=${got.get(n)} naive=$h")
    }
  }

  // ---- ta_trigram_lm_score: conditional LM vs naive counts ----

  test("ta_trigram_lm_score matches a naive conditional trigram model") {
    import spark.implicits._
    val got = q("ta_trigram_lm_score").fn(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, sc) => id -> ((n, sc)) }.toMap

    def bucket(prefix: String, k: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((prefix + k).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % 4096
    }
    val docs = graft.model.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect()
      .map { case (id, src, txt) =>
        (id, src, txt.filter(c => c >= ' ' && c <= '~'))
      }
      .filter(_._3.length >= 3)
    val tris = docs.flatMap { case (id, src, t) =>
      t.sliding(3).map(tri =>
        (id, src, bucket("lm3:", tri), bucket("lm2:", tri.take(2))))
    }
    val ref = tris.filter(r => Set("src1", "src3", "src5")(r._2))
    val c3 = ref.groupBy(_._3).map { case (b, v) => b -> v.size.toLong }
    val c2 = ref.groupBy(_._4).map { case (b, v) => b -> v.size.toLong }
    val naive = tris.groupBy(_._1).map { case (id, v) =>
      val fs = v.map { case (_, _, b3, b2) =>
        (c3.getOrElse(b3, 0L) + 1) * 1000000L / (c2.getOrElse(b2, 0L) + 4096)
      }
      id -> ((fs.size.toLong, fs.sum / fs.size))
    }
    assert(got.size == naive.size)
    naive.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: engine=${got(id)} naive=$exp")
    }
  }

  // ---- ev_ewma_smooth: recursive fold vs naive sequential EWMA ----

  test("ev_ewma_smooth matches a naive per-user sequential fold") {
    import spark.implicits._
    val got = q("ev_ewma_smooth").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect()

    val rows = graft.model.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
    val naive = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      var prev = -1L
      evs.sortBy(e => (e._2, e._3)).map { case (_, ts, id, v) =>
        val c = math.round(v * 100)
        prev = if (prev < 0) c else (c + 3 * prev) / 4
        (u, ts, id, prev)
      }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq == naive,
      s"first diff: ${got.toSeq.zip(naive).find(p => p._1 != p._2)}")
  }

  // ---- td_corpus_overlap_kmv: estimator quality on known overlap ----

  test("td_corpus_overlap_kmv estimates a planted 1/3 Jaccard within 3 sigma") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmv_overlap").toFile
    try {
      // srcA = docs 0..399, srcB = docs 200..599: |A∩B| = 200,
      // |A∪B| = 600, Jaccard = 1/3. k = 128 ⇒ σ ≈ sqrt(J(1-J)/k) ≈ 0.042.
      val rows =
        (0 until 400).map(i => (i.toLong, s"doc body $i", "en", "srcA", 10L)) ++
        (200 until 600).map(i => (i.toLong + 1000, s"doc body $i", "en", "srcB", 10L))
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = q("td_corpus_overlap_kmv").fn(spark, dir.getPath).collect()
      assert(out.length == 1)
      val r = out.head
      val est = r.getAs[Long]("jaccard_micro") / 1e6
      val exact = r.getAs[Long]("exact_jaccard_micro") / 1e6
      assert(math.abs(exact - 1.0 / 3) < 1e-3, s"fixture exact=$exact")
      assert(math.abs(est - exact) < 0.13, s"est=$est exact=$exact")
      assert(r.getAs[Long]("exact_inter") == 200)
      assert(r.getAs[Long]("exact_union") == 600)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  // ---- mm_scene_cut: detected cuts vs planted scene boundaries ----

  test("mm_scene_cut finds exactly the planted 7-frame scene boundaries") {
    import spark.implicits._
    val cuts = q("mm_scene_cut").fn(spark, sf)
      .select($"doc_id", $"frame_idx").as[(Long, Int)].collect()
    assert(cuts.nonEmpty)
    // every detection sits on a scene boundary (frame_idx % 7 == 0) —
    // within-scene consecutive hamming is exactly 2 by construction
    assert(cuts.forall(_._2 % 7 == 0), s"off-boundary cut: ${cuts.find(_._2 % 7 != 0)}")
    // and ~all boundaries are detected (an across-scene miss needs two
    // independent 48-bit hashes within hamming 8 — p ≈ 1e-6 per cut)
    val expected = graft.model.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, txt) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(txt.getBytes("UTF-8"))
        val n = java.lang.Integer.parseInt(
          md.slice(3, 4).map("%02x".format(_)).mkString, 16) + 10
        id -> (n - 1) / 7 // boundaries at 7, 14, … < n
      }.toMap
    val detected = cuts.groupBy(_._1).map { case (id, v) => id -> v.length }
    val totalExpected = expected.values.sum
    val totalDetected = detected.values.sum
    assert(totalDetected >= totalExpected - 1 && totalDetected <= totalExpected,
      s"detected=$totalDetected expected=$totalExpected")
  }
}
