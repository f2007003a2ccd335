package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing scale-evidence probe (VERDICT r18 next §7): the sf0.1
  * bench cannot evidence scale behavior — every query is sub-10 s and
  * fixed-latency-bound, so 8-vs-32-core ratios sit near 1. This probe
  * runs the TOP-10 bench queries against /tmp/sf1 (the ScaleProbe 10×
  * replication of sf0.1, built here if absent) at 8 and 32 cores,
  * min-of-2 each, and prints the BASELINE.md table. A data-bound
  * query should approach 3-4× at 32 cores; a query that does not gets
  * a documented reason in BASELINE.md (e.g. round-latency-bound
  * convergence loops, streaming micro-batch machinery).
  *
  * Run: sbt 'runMain graft.tools.R19ScaleProbe [queries...]' */
object R19ScaleProbe {
  private val top10 = Seq(
    "gr_lpa_conv", "bpe_train_rich", "st_rtbf", "dd_substr_scrub",
    "st_leftouter", "wp_train", "dd_substr_cov", "bpe_train",
    "st_interval", "a15_equidepth")

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sf1"
    val qs = if (args.nonEmpty) args.toSeq else top10

    // ---- build /tmp/sf1 once (ScaleProbe's 10x key-offset replication)
    locally {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      if (!new java.io.File(out + "/lineitem.parquet").exists) {
        new java.io.File(out).mkdirs()
        val li = spark.read.parquet(s"$src/lineitem.parquet")
        (0 until 10).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
          .reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
        val ev = spark.read.parquet(s"$src/events.parquet")
        (0 until 10).map(i => ev
            .withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("user_id", col("user_id") + lit(i * 1000L)))
          .reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$out/events.parquet")
        val docs = spark.read.parquet(s"$src/documents.parquet")
        (0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
          .reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        val emb = spark.read.parquet(s"$src/embeddings.parquet")
        (0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
          .reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders"))
          spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
        println("[r19-scale] built /tmp/sf1")
      }
      spark.stop()
    }

    // ---- probe at each core count with the bench's session config
    val results = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    for (cpus <- Seq(32, 8)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // prestage the artifacts the probe set reads, untimed (Bench rule)
      if (qs.exists(Set("st_rtbf", "dq_rtbf", "dd_substr_incr", "st_substr")))
        graft.llm.Dedup.ensureDedupIndexFor(spark, out)
      def clear(): Unit = {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      qs.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        try {
          fn(spark, out).write.format("noop").mode("overwrite").save(); clear() // warm
          val xs = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, out).write.format("noop").mode("overwrite").save()
            clear()
            (System.nanoTime() - t0) / 1e9
          }
          results((q, cpus)) = xs.min
          println(f"[r19-scale] cpus=$cpus $q%-18s min=${xs.min}%7.2f (${xs.map(x => f"$x%.2f").mkString("/")})")
        } catch {
          case e: Throwable =>
            println(s"[r19-scale] cpus=$cpus $q FAILED ${Option(e.getMessage).getOrElse("")}".take(160))
        }
      }
      spark.stop()
    }
    println("\n| query | sf1 8c s | sf1 32c s | speedup 8→32 |")
    println("|---|---|---|---|")
    qs.foreach { q =>
      (results.get((q, 8)), results.get((q, 32))) match {
        case (Some(a), Some(b)) =>
          println(f"| $q | $a%.2f | $b%.2f | ${a / b}%.2f |")
        case _ => println(s"| $q | — | — | — |")
      }
    }
  }
}
