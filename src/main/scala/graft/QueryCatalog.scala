package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalogue entry: a Spark query over a testdata sf directory plus
  * (when SQL-expressible) the equivalent ANSI SQL the driver runs in
  * DuckDB as the oracle. Keeping both halves in one value prevents the
  * queries/oracleSql maps from drifting apart.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object QueryCatalog {
  /** All registered query groups, in stable order. Every fn is wrapped
    * to register the engine's custom SQL functions on the session
    * first (idempotent, microseconds): several operators reference
    * them inside `expr(...)` strings and higher-order-function
    * lambdas, where only the session FunctionRegistry can resolve
    * them.
    */
  def all: Seq[Q] = raw.map(q => q.copy(fn = (s, d) => {
    graft.functions.exprs.register(s)
    q.fn(s, d)
  }))

  private def raw: Seq[Q] =
    graft.operators.RelationalQueries.all ++
      graft.operators.GeoQueries.all ++
      graft.operators.DedupQueries.all ++
      graft.operators.TextQueries.all ++
      graft.operators.SimilarityQueries.all ++
      graft.operators.MultimodalQueries.all ++
      graft.operators.EventQueries.all ++
      graft.operators.UrlQueries.all ++
      graft.operators.ExtraQueries.all ++
      graft.operators.GraphQueries.all ++
      graft.operators.PipelineQueries.all
}
