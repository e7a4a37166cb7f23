package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe (session-local, not part of the suite):
  * times isolated stages of a query under investigation.
  *
  * Current target: the warc.gz gates at grow_sf1 (64-69 s vs 2.8-4.6 s
  * plain) — splits write vs plan vs read.
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"stage":"$name","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    val docs = graft.model.Tables.documents(spark, d)
    val base = java.nio.file.Files.createTempDirectory("scratch-warc")
    val plainDir = s"$base/plain"
    val gzDir = s"$base/gz"
    try {
      time("write_plain") { graft.sources.Warc.write(docs, plainDir); 0L }
      time("write_gz") { graft.sources.Warc.writeGzip(docs, gzDir); 0L }
      time("write_gz_2nd") { graft.sources.Warc.writeGzip(docs, gzDir); 0L }
      def read(dir: String, cols: String) =
        spark.read.format("warc")
          .option("chunkBytes", (256 * 1024).toString).load(dir)
          .selectExpr(cols.split(";").toIndexedSeq: _*).count()
      time("read_plain_payload")(read(plainDir, "md5(payload)"))
      time("read_plain_header")(read(plainDir, "target_uri"))
      time("read_gz_payload")(read(gzDir, "md5(payload)"))
      time("read_gz_payload_2nd")(read(gzDir, "md5(payload)"))
      time("read_gz_header")(read(gzDir, "target_uri"))
      // planning alone: getNumPartitions forces planInputPartitions
      time("plan_gz") {
        spark.read.format("warc").option("chunkBytes", (256 * 1024).toString)
          .load(gzDir).rdd.getNumPartitions.toLong
      }
      val nFiles = new java.io.File(gzDir).listFiles().count(_.getName.endsWith(".warc.gz"))
      println(s"""{"gz_part_files":$nFiles}""")
      // single-thread micro: our member walk vs GZIPInputStream over
      // the same part file — isolates per-member overhead from Spark
      val f = new java.io.File(gzDir).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).maxBy(_.length())
      println(s"""{"micro_file_bytes":${f.length()}}""")
      time("micro_member_walk") {
        val in = new java.io.BufferedInputStream(
          new java.io.FileInputStream(f), 64 * 1024)
        val gz = new graft.sources.v2.GzipMemberStream(in, f.getPath)
        var n = 0L; var bytes = 0L
        try {
          var m = gz.readMember()
          while (m.isDefined) { n += 1; bytes += m.get.length; m = gz.readMember() }
        } finally { gz.end(); in.close() }
        println(s"""{"micro_members":$n,"micro_inflated":$bytes}""")
        n
      }
      time("micro_gzipinputstream") {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.BufferedInputStream(
            new java.io.FileInputStream(f), 64 * 1024), 64 * 1024)
        val buf = new Array[Byte](64 * 1024)
        var total = 0L
        var r = in.read(buf)
        while (r >= 0) { total += r; r = in.read(buf) }
        in.close()
        total
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
