package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst can push filters and
  * prune columns into the file scan; never cache here — callers decide
  * lifetime. At 100 TB these would be partitioned/bucketed tables behind
  * the same names, so everything downstream addresses tables only
  * through this facade.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** Every consumer of `events` works on `ts` as epoch-NANOS BIGINT
    * (gap/session math, hour buckets), which is exactly comparable
    * with DuckDB's `epoch_ns(ts)` — no timezone or precision drift.
    * The driver has shipped the column as both parquet
    * TIMESTAMP(NANOS) (whole-column nanos, which Spark's vectorized
    * reader only accepts as a raw long via the legacy flag) and
    * TIMESTAMP(MICROS); [[normalizeEvents]] maps either to the same
    * nanos long. MICROS files are read as TimestampType (NTZ
    * inference off), whose internal value IS the file's raw micros —
    * `unix_micros` returns it without any session-timezone
    * interpretation, exactly like DuckDB's naive `epoch_ns`.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(eventsRaw(s, d))

  /** The raw scan with the reader confs fixed, but WITHOUT the nanos
    * normalization — streaming gates need this schema to re-read the
    * same file through FileStreamSource (a normalized schema would
    * declare `ts` BIGINT against a timestamp column on disk), then
    * apply [[normalizeEvents]] to the stream like any batch frame.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    apply(s, d, "events")
  }

  /** Normalize `ts` to epoch-nanos BIGINT whatever the stored type:
    * LongType passes through (TIMESTAMP(NANOS) files under the legacy
    * flag, and test fixtures that write the nanos long directly);
    * TimestampType is the file's raw micros (see [[events]]) scaled
    * by 1000. Anything else fails loudly — silent reinterpretation of
    * a time column is how correctness bugs hide.
    */
  def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalArgumentException(
          s"events.ts must be BIGINT nanos or TIMESTAMP(MICROS), got $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
