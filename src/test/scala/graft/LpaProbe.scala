package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Memory-shape probe for gr_label_propagation at grown scale: runs
  * the catalogue query on SPARK_GRAFT_SF_DIR and prints one line per
  * completed stage (name, tasks, shuffle bytes, spill, peak exec
  * memory) so an OOM pinpoints its stage instead of dying opaque.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/growsf10 sbt "Test/runMain graft.LpaProbe"
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        System.err.println(
          f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d " +
          f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1fMB " +
          f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
          f"spill=${m.memoryBytesSpilled / 1e6}%9.1fMB " +
          f"peakExec=${m.peakExecutionMemory / 1e6}%9.1fMB  ${si.name.take(60)}")
      }
    })
    val q = graft.QueryCatalog.all.find(_.name == "gr_label_propagation").get
    val t0 = System.nanoTime()
    val n = q.fn(spark, d).count()
    println(f"[lpa] dir=$d rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
