package graft.tools
import org.apache.spark.sql.functions._

/** 100× document-corpus probe: replicate sf0.1's documents table 100×
  * (500k docs — id-offset copies, the ScaleProbe convention) and run
  * the core LLM-pipeline operators end to end. This is the direct
  * would-it-still-work evidence for the curation family's scale
  * claims: detection shuffles carry fixed-width hashes, scoring is
  * scan-local, trainers reduce to constant width — so the 10× → 100×
  * growth should track the scan, not explode.
  *
  * Run: `sbt 'runMain graft.tools.Doc100Probe [queries...]'` */
object Doc100Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sf10docs"
    if (!new java.io.File(out + "/documents.parquet").exists) {
      new java.io.File(out).mkdirs()
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until 100).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      // the doc-family queries only read documents; satisfy Sources for
      // the rest with links
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings"))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      println("built /tmp/sf10docs (500k documents)")
    }
    val defaultQs = Seq("dd_exact", "dd_urls", "dd_minhash", "ts_quality",
      "ts_normalize", "ds_shards", "ds_split", "ds_doremi", "tok_unigram_train")
    for (q <- (if (args.nonEmpty) args.toSeq else defaultQs)) {
      // bucketed-table setup is untimed, the Bench/Verify convention
      if (q.contains("pagerank_bucketed"))
        for (dir <- Seq(src, out)) graft.ops.Graph.ensurePrEdgesBucketed(spark, dir)
      // warm at the small sf (JIT; plans re-chosen by AQE at 100×)
      try graft.SparkEntry.queries(q)(spark, src).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$q warm FAILED ${e.getMessage.take(80)}") }
      for ((dir, label) <- Seq(src -> "sf0.1", out -> "100x")) {
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
          println(f"$q%-18s $label%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        } catch { case e: Throwable => println(s"$q $label FAILED ${e.getMessage.take(120)}") }
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
