package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Iterative graph analytics over the part↔supplier bipartite graph
  * derived from `lineitem` (edge = "this supplier shipped this part",
  * symmetrized so every node has in- and out-degree). Complements the
  * connected-components clustering in DedupQueries with a WEIGHTED
  * fixed-point iteration: PageRank with damping 0.85.
  *
  * All rank mass is integer micro-units (1.0 == 1_000_000), every
  * update is integer multiply/divide — exact, order-independent, and
  * replayable verbatim in the oracle (both engines truncate positive
  * integer division identically), so the iterative result is
  * hash-checked, not eyeballed. A float PageRank would differ in the
  * last ulp per aggregation order and could never be oracle-gated.
  *
  * Scale shape (100 TB): the edge list is checkpointed once and reused
  * by every iteration (the driver loops, the DATA never leaves the
  * executors); each iteration is one equi-join of edges with the
  * compact (node, rank) table on the shared `src` key plus one partial
  * aggregation by `dst` — the standard Pregel-as-joins layout where
  * per-iteration cost is O(|E|) shuffled bytes, independent of the
  * iteration count's history. The final top-100 is
  * TakeOrderedAndProject (per-partition heaps), not a global sort.
  */
object GraphQueries {

  private val Iters = 3

  private val pagerank = Q(
    "gr_pagerank",
    (s, d) => {
      import s.implicits._
      // checkpoint the |E| directed pairs, not the 2|E| symmetrized
      // union — union is lazy and shuffle-free, so halving the
      // materialized rows halves the (per-rep dominant) checkpoint
      // cost while the 3 iterations still re-read memory, not lineage
      val edges = Tables.lineitem(s, d)
        .select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
        .localCheckpoint()
      val sym = edges
        .unionByName(edges.select($"dst".as("src"), $"src".as("dst")))
      val deg = sym.groupBy($"src").agg(count(lit(1)).as("outdeg"))
      var ranks = deg.select($"src".as("node"), lit(1000000L).as("pr"))
      for (_ <- 1 to Iters) {
        // Fold rank/outdeg on the NODE table first (node-sized join),
        // so each iteration touches the edge table exactly once and
        // the small contrib side broadcasts — the edge list never
        // shuffles per iteration, only the partially-aggregated
        // (dst, sum) pairs do.
        val contribs = ranks.join(deg, $"node" === $"src")
          .select($"node".as("csrc"), expr("pr div outdeg").as("contrib"))
        ranks = sym
          .join(contribs, $"src" === $"csrc")
          .groupBy($"dst")
          .agg(sum($"contrib").as("s"))
          .select($"dst".as("node"), expr("150000 + (85 * s) div 100").as("pr"))
      }
      ranks.orderBy($"pr".desc, $"node").limit(100)
    },
    Some {
      // r0 is the uniform start; each rI unrolls one integer-exact
      // update. CASTs keep DuckDB's sum() from widening to HUGEINT
      // (the round-1 integer-type trap).
      def step(prev: String, out: String) =
        s"""$out AS (
           |  SELECT s.dst AS node,
           |         150000 + (85 * CAST(sum(r.pr // d.outdeg) AS BIGINT)) // 100 AS pr
           |  FROM sym s JOIN deg d ON s.src = d.src
           |  JOIN $prev r ON s.src = r.node
           |  GROUP BY s.dst)""".stripMargin
      s"""WITH edges AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem),
         |sym AS (SELECT src, dst FROM edges
         |        UNION ALL SELECT dst, src FROM edges),
         |deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT node, pr FROM r3
         |ORDER BY pr DESC, node LIMIT 100""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(pagerank)
}
