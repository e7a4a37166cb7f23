package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operator replays: the Zipf octave profile re-derived from
  * an in-memory rank sort (the operator itself never ranks the
  * vocabulary globally — that's the point being checked), the epoch
  * shuffle re-derived from MessageDigest, and the IVF→PQ composition's
  * structural contract (candidates come only from the probed cells).
  */
class Round8OpsSpec extends AnyFunSuite {

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

  test("ta_zipf_octave_decay: histogram-range device equals a global rank sort") {
    import spark.implicits._
    val got = q("ta_zipf_octave_decay").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // naive replay: rank every word globally, bucket ranks by octave
    val words = graft.model.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
      .as[String].collect()
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = freq.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
      .map { case ((_, f), i) => (i + 1L, f) } // (rank, freq)
    val byOct = ranked.groupBy { case (r, _) =>
      (63 - java.lang.Long.numberOfLeadingZeros(r)).toLong // floor(log2 r)
    }.toSeq.sortBy(_._1).map { case (o, rs) =>
      (o, rs.size.toLong, rs.map(_._2).sum)
    }
    val expected = byOct.zip((0L, 0L, 0L) +: byOct).map {
      case ((o, nw, tm), (_, _, prevTm)) =>
        (o, nw, tm, if (prevTm == 0) 0L else tm * 1000 / prevTm)
    }
    assert(got == expected)
    // the rank-frequency law actually decays: every octave past the
    // head carries no MORE mass per word than the one before
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 / math.max(b._2, 1) <= a._3 / math.max(a._2, 1))
    case _ => }
  }

  test("td_epoch_shuffle: md5 bucket manifest replays from MessageDigest") {
    import spark.implicits._
    val got = q("td_epoch_shuffle").fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val docs = graft.model.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect()
    def bucket(e: Int, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$e#$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16)
    }
    val expected = docs.groupBy { case (id, _) => bucket(1, id) }
      .toSeq.sortBy(_._1).map { case (b, rows) =>
        (b, rows.size.toLong, rows.map(_._2).sum,
          rows.count { case (id, _) => bucket(2, id) == b }.toLong)
      }
    assert(got == expected)
    // epoch independence: staying put is the 1/256 exception
    assert(got.map(_._4).sum < docs.length / 64)
  }

  test("sim_ivf_pq_compose: results come only from the probed cells, ADC-shortlisted") {
    import spark.implicits._
    val got = q("sim_ivf_pq_compose").fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 10)
    // exact distances ascend with the (dist, vec_id) tie-break
    assert(got.map(r => (r._3, r._1)) == got.map(r => (r._3, r._1)).sorted)
    // every result sits in one of (at most) 2 IVF cells — the coarse
    // stage actually restricted the scan
    val assigned = SimilarityQueries.ivfAssigned(spark, sf, kCents = 8)
    val cellOf = assigned.select($"vec_id", $"cent_id")
      .as[(Long, Long)].collect().toMap
    val resultCells = got.map(r => cellOf(r._1)).toSet
    assert(resultCells.size <= 2,
      s"results span ${resultCells.size} cells — IVF stage not restricting")
    // and the composition is NOT the unrestricted PQ search: the two
    // must be allowed to differ, but the exact re-rank contract (top
    // 10 of the shortlist by full-dim distance) must hold regardless
    assert(got.map(_._3).distinct.size > 1)
  }
}
