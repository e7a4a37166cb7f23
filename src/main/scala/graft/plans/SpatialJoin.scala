package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

import graft.functions.{GeoUtil, StContains}

/** Custom physical planning for the point-in-polygon join (SURVEY
  * §4.2 item 3): plans a logical
  * `Join(…, cond = layerEq && … && st_contains(rings, point))` as a
  * broadcast of the polygon side with a PER-LAYER SORTED INTERVAL
  * INDEX — the role the reference's per-layer R-tree plays
  * (geo-indices.js:22-56) — instead of the stock broadcast hash join
  * that re-tests every same-layer polygon per point.
  *
  * Index: a uniform 2-D CELL GRID per layer (cell edge = the layer's
  * mean bbox extent), polygons registered in every cell their bbox
  * overlaps. A probe hashes its point to ONE cell and tests only that
  * cell's candidates — O(candidates-in-cell + answer) per point, which
  * at constant polygon density is O(1) + answer regardless of layer
  * size. (A 1-D interval index — the previous design — degrades to
  * O(sqrt(n)) per probe at constant density because a whole x-column
  * of the map shares each interval; the reference's R-tree
  * (geo-indices.js:22-56) and this grid are both genuinely 2-D.)
  *
  * Scale: the polygon side must be broadcastable (it is the
  * dimension-sized side in the reference workload — the same
  * assumption its in-memory R-tree makes). For an un-broadcastable
  * polygon side, DON'T install this strategy: the default plan
  * (equi-shuffle on layer + bbox prefilter + residual st_contains)
  * already partitions correctly.
  *
  * Opt-in: `GraftPlanner.install(spark)`.
  */
object SpatialJoinStrategy extends SparkStrategy {

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, jt @ (Inner | LeftOuter), Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val conjuncts = splitConjuncts(cond)
      val contains = conjuncts.collectFirst {
        case sc: StContains
            if sc.left.references.subsetOf(r.outputSet) &&
              sc.right.references.subsetOf(l.outputSet) => sc
      }
      val layerEq = conjuncts.collectFirst {
        case eq @ EqualTo(a, b)
            if a.references.subsetOf(l.outputSet) &&
              b.references.subsetOf(r.outputSet) => (eq, a, b)
        case eq @ EqualTo(a, b)
            if a.references.subsetOf(r.outputSet) &&
              b.references.subsetOf(l.outputSet) => (eq, b, a)
      }
      (contains, layerEq) match {
        case (Some(sc), Some((eq, lKey, rKey))) if canBuildIndex(r) =>
          val residual = conjuncts.filterNot(c => c.fastEquals(sc) || c.fastEquals(eq))
          BroadcastSpatialJoinExec(
            planLater(l), planLater(r), jt,
            lKey, rKey, sc.left, sc.right,
            residual.reduceOption(And)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Size guard: the exec node collects the polygon side to the driver
    * to build the interval index, so only claim the join when that
    * side's estimated size fits the broadcast threshold (the same
    * stats check Spark's own JoinSelection.canBroadcast makes;
    * threshold <= 0 = broadcasting disabled). Over the cap we return
    * Nil and the default equi-shuffle + bbox-prefilter plan — which
    * partitions correctly at any scale — is used instead.
    */
  private def canBuildIndex(r: LogicalPlan): Boolean = {
    val threshold =
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold
  }
}

/** Per-layer uniform-cell polygon grid (see strategy Scaladoc). */
private[plans] final class LayerIndex(
    val minX: Double,
    val minY: Double,
    val cell: Double,
    val cells: java.util.HashMap[java.lang.Long, Array[Int]],
    val bboxes: Array[Array[Double]], // xmin, ymin, xmax, ymax
    val rings: Array[Array[Array[Array[Double]]]], // JVM-primitive (serializable)
    val rows: Array[InternalRow],
) extends Serializable {

  /** Indices of polygons containing (px, py). */
  def probe(px: Double, py: Double, out: java.util.ArrayList[Int]): Unit = {
    val cx = math.floor((px - minX) / cell).toLong
    val cy = math.floor((py - minY) / cell).toLong
    val cand = cells.get((cx << 32) | (cy & 0xffffffffL))
    if (cand != null) {
      var i = 0
      while (i < cand.length) {
        val j = cand(i)
        val b = bboxes(j)
        if (px >= b(0) && px <= b(2) && py >= b(1) && py <= b(3) &&
          GeoUtil.containsRawXY(rings(j), px, py)) {
          out.add(j)
        }
        i += 1
      }
    }
  }
}

private[plans] object LayerIndex {

  /** Build from (row, rings, bbox) triples. Cell edge = the layer's
    * mean bbox extent (clamped away from zero for degenerate layers):
    * each polygon then overlaps O(1) cells and each cell holds O(1)
    * polygons at constant density, so build is linear and a probe
    * touches a bounded candidate list. Every point hashes to exactly
    * one cell, so no dedup of emitted matches is needed.
    */
  def build(arr: Array[(InternalRow, Array[Array[Array[Double]]], Array[Double])]): LayerIndex = {
    var minX = Double.PositiveInfinity
    var minY = Double.PositiveInfinity
    var sumExtent = 0.0
    arr.foreach { case (_, _, b) =>
      minX = math.min(minX, b(0))
      minY = math.min(minY, b(1))
      sumExtent += math.max(b(2) - b(0), b(3) - b(1))
    }
    val cell = math.max(sumExtent / math.max(arr.length, 1), 1e-9)
    val byCell = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Int]]()
    arr.indices.foreach { j =>
      val b = arr(j)._3
      var cx = math.floor((b(0) - minX) / cell).toLong
      val cx1 = math.floor((b(2) - minX) / cell).toLong
      val cy0 = math.floor((b(1) - minY) / cell).toLong
      val cy1 = math.floor((b(3) - minY) / cell).toLong
      while (cx <= cx1) {
        var cy = cy0
        while (cy <= cy1) {
          byCell
            .computeIfAbsent((cx << 32) | (cy & 0xffffffffL), _ => new java.util.ArrayList[Int]())
            .add(j)
          cy += 1
        }
        cx += 1
      }
    }
    val cells = new java.util.HashMap[java.lang.Long, Array[Int]](byCell.size() * 2)
    byCell.forEach { (k, v) =>
      val a = new Array[Int](v.size())
      var i = 0
      while (i < a.length) { a(i) = v.get(i); i += 1 }
      cells.put(k, a)
    }
    new LayerIndex(minX, minY, cell, cells,
      arr.map(_._3), arr.map(_._2), arr.map(_._1))
  }
}

case class BroadcastSpatialJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    joinType: JoinType,
    leftKey: Expression,
    rightKey: Expression,
    rightRings: Expression,
    leftPoint: Expression,
    residual: Option[Expression],
) extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastSpatialJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // Build the per-layer index once on the driver from the (small,
    // dimension-sized) polygon side, then broadcast it.
    val rightRows = right.executeCollect().map(_.copy())
    val keyEval = BindReferences.bindReference(rightKey, right.output)
    val ringsEval = BindReferences.bindReference(rightRings, right.output)

    val grouped = new java.util.HashMap[Any, java.util.ArrayList[(InternalRow, Array[Array[Array[Double]]])]]()
    rightRows.foreach { row =>
      val key = keyEval.eval(row)
      val rings = ringsEval.eval(row).asInstanceOf[ArrayData]
      if (key != null && rings != null) {
        grouped.computeIfAbsent(key, _ => new java.util.ArrayList())
          .add((row, GeoUtil.toRawRings(rings)))
      }
    }
    val indices = new java.util.HashMap[Any, LayerIndex]()
    grouped.forEach { (key, polys) =>
      val arr = polys.toArray(Array.empty[(InternalRow, Array[Array[Array[Double]]])])
        .map { case (row, rings) => (row, rings, GeoUtil.bboxRaw(rings)) }
      indices.put(key, LayerIndex.build(arr))
    }
    val bc = sparkContext.broadcast(indices)

    val isLeftOuter = joinType == LeftOuter
    val leftOutput = left.output
    val rightAttrs = right.output
    val outAttrs = output
    val leftKeyExpr = leftKey
    val leftPointExpr = leftPoint
    val residualExpr = residual

    left.execute().mapPartitions({ iter =>
      val idx = bc.value
      val keyEvalL = BindReferences.bindReference(leftKeyExpr, leftOutput)
      val pointEvalL = BindReferences.bindReference(leftPointExpr, leftOutput)
      val residualPred = residualExpr.map(e =>
        Predicate.create(e, leftOutput ++ rightAttrs))
      residualPred.foreach(_.initialize(0))
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(rightAttrs.size)(null))
      val proj = UnsafeProjection.create(outAttrs.map(_.asInstanceOf[Expression]), outAttrs)
      val hits = new java.util.ArrayList[Int]()

      iter.flatMap { lrow =>
        val key = keyEvalL.eval(lrow)
        val point = pointEvalL.eval(lrow).asInstanceOf[ArrayData]
        hits.clear()
        val layer = if (key == null) null else idx.get(key)
        if (layer != null && point != null && point.numElements() >= 2) {
          layer.probe(point.getDouble(0), point.getDouble(1), hits)
        }
        val matches = new scala.collection.mutable.ArrayBuffer[InternalRow](hits.size())
        var i = 0
        while (i < hits.size()) {
          joined(lrow, layer.rows(hits.get(i)))
          if (residualPred.forall(_.eval(joined))) {
            matches += proj(joined).copy()
          }
          i += 1
        }
        if (matches.isEmpty && isLeftOuter) {
          joined(lrow, nullRight)
          Iterator.single(proj(joined).copy())
        } else matches.iterator
      }
    }, preservesPartitioning = true)
  }
}

/** Installer for the engine's custom planning. */
object GraftPlanner {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(SpatialJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SpatialJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AddBboxPrefilter)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AddBboxPrefilter
    }
  }

  def uninstall(spark: SparkSession): Unit = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == SpatialJoinStrategy)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == AddBboxPrefilter)
  }
}
