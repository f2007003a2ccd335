package graft.tools

import org.apache.spark.sql.SparkSession

/** r19 §2.2 probe for the dedup-LSH 32-core contention class
  * (VERDICT r18 next §6: dd_minhash/dd_embcos/dd_cluster_lsh/
  * dq_tcloseness run ~20-25% FASTER at 8 cores than 32 at sf0.1).
  * Hypothesis under test: their persisted intermediates materialize at
  * the full shuffle-partition count, and with Spark's default
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false`
  * AQE cannot coalesce partitions under an InMemoryRelation — so every
  * downstream stage over cached tiny data schedules cpu-count tasks.
  * Runs the contention set min-of-3 with the flag off (default) and on,
  * at the given core count.
  *
  * Run: sbt 'runMain graft.tools.LshContentionProbe <cpus> <sfDir>' */
object LshContentionProbe {
  private val set: Seq[String] =
    sys.env.get("LSH_PROBE_SET").map(_.split(",").toSeq).getOrElse(Seq(
      "dd_minhash", "dd_oph", "dd_ppjoin_capped",
      "dd_cluster_lsh", "dd_embcos", "dq_tcloseness"))

  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    Seq("false", "true").foreach { flag =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir",
          sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", flag)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def clear(): Unit = {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      set.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        // warmup once, then min-of-3
        fn(spark, sf).write.format("noop").mode("overwrite").save(); clear()
        val xs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          clear()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[lsh-probe] cpus=$cpus cachedAqe=$flag $name%-18s " +
          f"min=${xs.min}%6.2f (${xs.map(x => f"$x%.2f").mkString("/")})")
      }
      spark.stop()
    }
  }
}
