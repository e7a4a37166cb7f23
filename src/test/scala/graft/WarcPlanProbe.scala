package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** WARC split-planning cost probe (round-12 ask #4): measures the
  * driver-serial header skim vs the one-task-per-file Spark-job
  * planner over a files × records grid, printing one JSONL row per
  * cell. The claim under test: job planning removes the driver-serial
  * ∝ total-records term (wall ≈ slowest single file, not the sum).
  *
  *   SPARK_GRAFT_WARC_GRID="8x20000,16x20000" \
  *     sbt "Test/runMain graft.WarcPlanProbe"
  */
object WarcPlanProbe {
  private def writeFixture(dir: Path, files: Int, records: Int): Unit = {
    val payload = ("x" * 120).getBytes(StandardCharsets.UTF_8)
    for (f <- 0 until files) {
      val out = new java.io.BufferedOutputStream(
        Files.newOutputStream(dir.resolve(f"$f%04d.warc")), 1 << 20)
      try {
        for (i <- 0 until records) {
          val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Record-ID: <urn:probe:$f-$i>\r\n" +
            s"WARC-Date: 2020-01-01T00:00:00Z\r\n" +
            s"WARC-Target-URI: http://f$f.example/$i\r\n" +
            s"Content-Type: text/plain\r\n" +
            s"Content-Length: ${payload.length}\r\n\r\n")
            .getBytes(StandardCharsets.UTF_8)
          out.write(head); out.write(payload); out.write('\r'); out.write('\n')
          out.write('\r'); out.write('\n')
        }
      } finally out.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val grid = sys.env.getOrElse("SPARK_GRAFT_WARC_GRID", "8x20000")
      .split(",").toSeq.map { cell =>
        val Array(f, r) = cell.trim.split("x"); (f.toInt, r.toInt)
      }
    for ((files, records) <- grid) {
      val dir = Files.createTempDirectory("warc-plan-probe")
      try {
        writeFixture(dir, files, records)
        // chunk small enough that every file yields many splits
        def plan(via: String): (Double, Int) = {
          val t0 = System.nanoTime()
          val n = spark.read.format("warc")
            .option("chunkBytes", (256 * 1024).toString)
            .option("planVia", via)
            .load(dir.toString).rdd.getNumPartitions
          ((System.nanoTime() - t0) / 1e9, n)
        }
        // job first (includes one-time scheduler warmup — biased
        // AGAINST the claim), then driver; then a second job pass warm
        val (tJob, nJob) = plan("job")
        val (tDrv, nDrv) = plan("driver")
        val (tJob2, _) = plan("job")
        println(s"""{"files":$files,"records_per_file":$records,""" +
          s""""driver_sec":$tDrv,"job_sec":$tJob,"job_warm_sec":$tJob2,""" +
          s""""splits_driver":$nDrv,"splits_job":$nJob}""")
      } finally {
        import scala.jdk.CollectionConverters._
        Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
    }
    spark.stop()
  }
}
