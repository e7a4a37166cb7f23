package graft

import org.scalatest.funsuite.AnyFunSuite

/** Freshness gate for the generated physical-plan audit (PLANS.md):
  * every catalogue query must have exactly one `## name` section and
  * the audit must not keep sections for queries that no longer exist —
  * the same contract CatalogIndexSpec enforces for the COVERAGE.md
  * index. Round 8 shipped an entry whose PLANS.md section was missing
  * and nothing failed; this is the spec that would have.
  */
class PlansFreshnessSpec extends AnyFunSuite {

  test("PLANS.md sections match QueryCatalog exactly") {
    val f = new java.io.File("PLANS.md")
    assume(f.exists(), "PLANS.md absent on this machine")
    val text = scala.io.Source.fromFile(f, "UTF-8").mkString
    val listed = "(?m)^## ([a-z0-9_]+)$".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    val catalogue = QueryCatalog.all.map(_.name)
    assert(listed.size == listed.distinct.size,
      "PLANS.md has duplicate sections")
    assert(listed.toSet == catalogue.toSet,
      s"plan-audit drift — missing: ${catalogue.toSet -- listed.toSet}, " +
        s"stale: ${listed.toSet -- catalogue.toSet}; " +
        "run `sbt \"runMain graft.Plans /root/testdata/sf0.01 PLANS.md\"`")
  }
}
