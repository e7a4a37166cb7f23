package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.functions.{PolyBbox, StContains}

/** Optimizer rule: a join condition containing `st_contains(rings,
  * point)` (polygon side on the right, point side on the left) gains
  * an automatic BBOX PREFILTER — the polygon's bbox is PROJECTED onto
  * the build side (computed once per polygon row, not per candidate
  * pair) and four cheap double comparisons guard the exact ray-casting
  * test, which `And` short-circuits away for the overwhelming majority
  * of same-key pairs. This is the rewrite a user would otherwise
  * hand-write (as InspectorPipeline does); the rule makes the naive
  * `layerEq && st_contains(...)` formulation get the good plan.
  *
  * Idempotent: skips joins whose build side already projects a
  * [[PolyBbox]] (hand-written bbox conjuncts don't trigger it either —
  * they make the exact test rarely-evaluated already, and one extra
  * guard layer is harmless; the marker check keeps the fixed-point
  * batch terminating).
  */
object AddBboxPrefilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, jt, Some(cond), hint)
        if !alreadyRewritten(r) =>
      val sc = splitConjuncts(cond).collectFirst {
        case e: StContains
            if e.left.references.subsetOf(r.outputSet) &&
              e.right.references.subsetOf(l.outputSet) => e
      }
      sc match {
        case Some(contains) =>
          val bboxAlias = Alias(PolyBbox(contains.left), "__graft_bbox")()
          val newRight = Project(r.output :+ bboxAlias, r)
          val bbox = bboxAlias.toAttribute
          def item(a: Expression, i: Int) =
            GetArrayItem(a, Literal(i, IntegerType))
          val px = item(contains.right, 0)
          val py = item(contains.right, 1)
          val guard = Seq(
            GreaterThanOrEqual(px, item(bbox, 0)),
            LessThanOrEqual(px, item(bbox, 2)),
            GreaterThanOrEqual(py, item(bbox, 1)),
            LessThanOrEqual(py, item(bbox, 3)),
          ).reduce[Expression](And)
          // rebuild from the conjunct list (a tree transform would
          // descend into the replacement and recurse forever)
          val newCond = splitConjuncts(cond)
            .map(c => if (c.fastEquals(contains)) And(guard, c) else c)
            .reduce[Expression](And)
          // restore the original output (the helper column must not
          // leak past the join)
          Project(j.output, Join(l, newRight, jt, Some(newCond), hint))
        case None => j
      }
  }

  private def alreadyRewritten(r: LogicalPlan): Boolean = r.exists {
    case p: Project => p.projectList.exists(_.exists(_.isInstanceOf[PolyBbox]))
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
