package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench + equivalence probe for the md5-device kernels: the SQL
  * form `CAST(conv(substring(md5(concat('p:', s)), 1, n), 16, 10) AS
  * BIGINT)` vs [[graft.functions.Md5PrefixLong]], and builtin `md5` vs
  * [[graft.functions.Md5HexMulti]]. Run:
  *
  *   sbt "Test/runMain graft.HashProbe"
  */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.exprs.register(spark)
    import spark.implicits._

    val df = spark.range(n).select(
      concat(lit("tok"), ($"id" % 100000).cast("string")).as("s"))
      .localCheckpoint()

    def time(label: String, q: => org.apache.spark.sql.DataFrame): Long = {
      q.count() // warm
      val reps = 3
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1000000L
      }
      println(s"[hashprobe] $label min=${times.min}ms all=$times")
      times.min
    }

    // equivalence first (any mismatch = abort loudly)
    val diff = df.select(
      expr("CAST(conv(substring(md5(concat('p:', s)), 1, 6), 16, 10) AS BIGINT)").as("o"),
      expr("md5_prefix_long(6, 'p:', s)").as("m"),
      md5($"s").as("oh"), expr("md5_hex(s)").as("mh"))
      .filter($"o" =!= $"m" || $"oh" =!= $"mh").count()
    require(diff == 0L, s"md5 kernel mismatch on $diff rows")
    val diff12 = df.select(
      expr("CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)").as("o"),
      expr("md5_prefix_long(12, s)").as("m")).filter($"o" =!= $"m").count()
    require(diff12 == 0L, s"md5 prefix-12 mismatch on $diff12 rows")
    println("[hashprobe] equivalence OK")

    time("old conv(substring(md5))",
      df.select(expr(
        "CAST(conv(substring(md5(concat('p:', s)), 1, 6), 16, 10) AS BIGINT)").as("v")))
    time("new md5_prefix_long",
      df.select(expr("md5_prefix_long(6, 'p:', s)").as("v")))
    time("old md5 hex", df.select(md5($"s").as("v")))
    time("new md5_hex", df.select(expr("md5_hex(s)").as("v")))
    // higher-order-function (interpreted lambda) context
    val arr = spark.range(n / 20).select(
      expr("transform(sequence(0, 19), i -> concat('tok', CAST(i AS STRING)))").as("w"))
      .localCheckpoint()
    time("HOF old", arr.select(expr(
      """aggregate(w, 0L, (acc, x) ->
        |  acc + CAST(conv(substring(md5(concat('p:', x)), 1, 6), 16, 10) AS BIGINT))""".stripMargin).as("v")))
    time("HOF new", arr.select(expr(
      "aggregate(w, 0L, (acc, x) -> acc + md5_prefix_long(6, 'p:', x))").as("v")))
    spark.stop()
  }
}
