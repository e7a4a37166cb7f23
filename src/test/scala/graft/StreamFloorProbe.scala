package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor probe for the streaming gates: a minimal stateful streaming
  * query (tiny parquet fixture → groupBy count → memory sink,
  * complete mode) run under the same gate confs, with phase timings —
  * what the per-gate cost would be if the gate did NO work.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "floor")
    spark.range(100).select($"id", ($"id" % 5).as("k"))
      .coalesce(1).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    for (rep <- 1 to 4; parts <- Seq(2, 8)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(s"$dir/in")
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(s"floor_${rep}_$parts")
        .option("checkpointLocation", s"$dir/ckpt_${rep}_$parts")
        .start()
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val t2 = System.nanoTime()
      val n = spark.table(s"floor_${rep}_$parts").count()
      q.stop()
      val t3 = System.nanoTime()
      println(f"[floor] rep=$rep parts=$parts start=${(t1 - t0) / 1e9}%.2f " +
        f"process=${(t2 - t1) / 1e9}%.2f stopAndRead=${(t3 - t2) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
