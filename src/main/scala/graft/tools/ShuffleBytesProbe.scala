package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume probe: runs each named SparkEntry query once and
  * reports total shuffle bytes WRITTEN across its jobs — the evidence
  * behind "narrower shuffle" claims (e.g. dd_lines_hashed's 8-byte
  * detection key vs dd_lines' string key), which wall-clock alone can
  * hide on a machine where the shuffle isn't the bottleneck yet. */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("PROBE_QUERIES", "dd_lines,dd_lines_hashed").split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save() // warmup, not counted
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(2000) // drain the async listener bus
      bytes.set(0)
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(2000)
      println(s"""{"query":"$n","shuffle_mb":${math.rint(bytes.get / 1e4) / 100}}""")
    }
    spark.stop()
  }
}
