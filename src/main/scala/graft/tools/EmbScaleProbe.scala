package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for the embedding-corpus training loops (ml_kmeans):
  * replicate sf0.1's embeddings 100× (5k → 500k vectors, vec_id
  * offset per copy) into /tmp/sf10emb and time the query at both
  * scales. The Lloyd loop's per-iteration cost is one scan + a
  * constant-width reduce, so the 100× run should scale ~linearly in
  * scan time with zero growth in shuffled bytes (the K×(D+2) partial
  * aggregate is size-independent). Run: sbt "runMain
  * graft.tools.EmbScaleProbe [query...]". */
object EmbScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sf10emb"
    if (!new java.io.File(out + "/embeddings.parquet").exists) {
      new java.io.File(out).mkdirs()
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until 100).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents"))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      println("built /tmp/sf10emb (500k embeddings)")
    }
    for (q <- (if (args.nonEmpty) args.toSeq else Seq("ml_kmeans"))) {
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
