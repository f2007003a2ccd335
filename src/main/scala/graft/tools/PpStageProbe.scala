package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object PpStageProbe {
  def main(args: Array[String]): Unit = {
    val flag = if (args.nonEmpty) args(0) else "true"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", flag)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.put(si.stageId, (si.name.split("\n")(0).take(60), dur, si.numTasks,
          si.taskMetrics.executorRunTime))
      }
    })
    val fn = graft.SparkEntry.queries("dd_ppjoin")
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    stages.clear()
    val t0 = System.nanoTime()
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    println(f"[pp] flag=$flag total ${(System.nanoTime()-t0)/1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (n, d, t, rt)) =>
      println(f"[pp] stage $id%4d wall=${d/1000.0}%7.2f s tasks=$t%3d cpu=${rt/1000.0}%8.2f s  $n")
    }
    spark.stop()
  }
}
