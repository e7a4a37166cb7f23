package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared by the query catalogue.
  *
  * Money math: the synthetic prices carry exactly two decimals, but the
  * parquet type is double, so a plain SUM(double) is order-dependent in
  * the last ulp and will not hash-match a DuckDB oracle. We convert to
  * integer cents first (`round(x*100)` is exact for 2-decimal doubles),
  * sum as BIGINT (exact, order-independent, overflow-safe to ~9e16
  * cents), and only divide back to a double at the very end when a
  * single deterministic division is all that remains.
  */
object Cols {
  /** Exact integer cents for a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** One deterministic division back to currency units. */
  def fromCents(c: Column): Column = c.cast("double") / 100.0

  /** SQL fragment mirroring [[cents]] for the DuckDB oracle. */
  def centsSql(e: String): String = s"CAST(round(($e) * 100) AS BIGINT)"

  /** Fan a scan out to the session's full parallelism before a
    * CPU-heavy stage. Small dimension-sized inputs often arrive as one
    * parquet split (and one row group is unsplittable), which would
    * otherwise pin hash/codec-bound pipelines to a single core; the
    * tiny shuffle buys full-width execution. No-op effect on results.
    */
  def fanout(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
