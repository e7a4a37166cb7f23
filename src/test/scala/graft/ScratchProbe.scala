package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe (session-local, not part of the suite):
  * times isolated stages of a query under investigation.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/grow_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"stage":"$name","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    val docs = graft.model.Tables.documents(spark, d)
      .select($"doc_id", $"source",
        regexp_replace($"text", "[^ -~]", "").as("t"))
      .filter(length($"t") >= 3)

    // warmup scan
    time("scan_only")(docs.count())
    time("scan_only2")(docs.count())
    // explode positions only (no md5)
    time("explode_only")(docs.select($"doc_id",
      explode(expr("sequence(1, length(t) - 2)")).as("i")).count())
    // explode + ONE md5 per position
    time("explode_md5x1")(docs.select($"doc_id",
      explode(expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
      .select($"doc_id",
        (expr("CAST(conv(substring(md5(concat('lm3:', tri)), 1, 6), 16, 10) AS BIGINT)") % 4096).as("b3"))
      .groupBy($"b3").count().count())
    // explode + TWO md5s (the real projection)
    time("explode_md5x2")(docs.select($"doc_id",
      explode(expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
      .select($"doc_id",
        (expr("CAST(conv(substring(md5(concat('lm3:', tri)), 1, 6), 16, 10) AS BIGINT)") % 4096).as("b3"),
        (expr("CAST(conv(substring(md5(concat('lm2:', substring(tri, 1, 2))), 1, 6), 16, 10) AS BIGINT)") % 4096).as("b2"))
      .groupBy($"b3", $"b2").count().count())
    // per-doc agg over the two-md5 stream (adds the doc_id shuffle shape)
    time("perdoc_agg")(docs.select($"doc_id",
      explode(expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
      .select($"doc_id",
        (expr("CAST(conv(substring(md5(concat('lm3:', tri)), 1, 6), 16, 10) AS BIGINT)") % 4096).as("b3"))
      .groupBy($"doc_id").agg(count(lit(1)), sum($"b3")).count())
    // in-row HOF aggregate with one md5 per position (codegen question)
    time("hof_md5x1")(docs.select($"doc_id",
      expr("""aggregate(sequence(1, length(t) - 2), 0L, (acc, i) ->
        acc + CAST(conv(substring(md5(concat('lm3:', substring(t, i, 3))), 1, 6), 16, 10) AS BIGINT) % 4096)""").as("s"))
      .groupBy().sum("s").count())
    // in-row HOF with two md5s per position
    time("hof_md5x2")(docs.select($"doc_id",
      expr("""aggregate(sequence(1, length(t) - 2), 0L, (acc, i) ->
        acc + CAST(conv(substring(md5(concat('lm3:', substring(t, i, 3))), 1, 6), 16, 10) AS BIGINT) % 4096
            + CAST(conv(substring(md5(concat('lm2:', substring(t, i, 2))), 1, 6), 16, 10) AS BIGINT) % 4096)""").as("s"))
      .groupBy().sum("s").count())

    spark.stop()
  }
}
