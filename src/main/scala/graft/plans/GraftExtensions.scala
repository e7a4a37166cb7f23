package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Base62EncodeHex, CosineApprox, CosineE9, JsCoordJoin, LshBucket, MortonInterleave, RollingHash, SortedIntersectCount, StContains}

/** Config-time registration of the engine's custom expressions and
  * physical strategy:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * The same surface is available at runtime on an existing session via
  * `graft.functions.exprs.register(spark)` + `GraftPlanner.install`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("st_contains"),
      info("st_contains", "st_contains(rings, point) - point-in-polygon with holes, boundary-inclusive"),
      (es: Seq[Expression]) => StContains(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("base62_encode_hex"),
      info("base62_encode_hex", "base62_encode_hex(hex) - base-62 encoding of a hex digest"),
      (es: Seq[Expression]) => Base62EncodeHex(es.head)))
    e.injectFunction((
      FunctionIdentifier("js_coord_join"),
      info("js_coord_join", "js_coord_join(array<double>) - ECMAScript Array.join(',')"),
      (es: Seq[Expression]) => JsCoordJoin(es.head)))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - Karp-Rabin fingerprint mod 2^31-1"),
      (es: Seq[Expression]) => RollingHash(es.head)))
    e.injectFunction((
      FunctionIdentifier("cosine_e9"),
      info("cosine_e9", "cosine_e9(array<float>, array<float>) - round(cosine*1e9), decimal-exact"),
      (es: Seq[Expression]) => CosineE9(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_approx"),
      info("cosine_approx", "cosine_approx(array<float>, array<float>) - double-precision cosine prefilter"),
      (es: Seq[Expression]) => CosineApprox(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(array<float>) - 6-plane random-hyperplane LSH bucket id"),
      (es: Seq[Expression]) => LshBucket(es.head)))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "sorted_intersect_count(array<bigint>, array<bigint>) - intersection size of two ascending-sorted arrays"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("morton_interleave"),
      info("morton_interleave", "morton_interleave(x, y) - Z-order curve key of two non-negative cell coordinates"),
      (es: Seq[Expression]) => MortonInterleave(es(0), es(1))))
    e.injectPlannerStrategy(_ => SpatialJoinStrategy)
    e.injectOptimizerRule(_ => AddBboxPrefilter)
  }
}
