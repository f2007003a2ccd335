package graft.tools
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sf1"
    // 10x each fact table with key offsets (schema-preserving)
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
      for (t <- Seq("region","nation","customer","supplier","part","orders"))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
      println("built /tmp/sf1")
    }
    // default = the full cross-section; pass query names as args to
    // probe a subset (e.g. just the paths a round changed)
    val defaultQs = Seq("ep2_range_max","j6_self_align","p4_derived","w3_crossing",
      "dd_jaccard","dd_minhash","dd_exact","ts_quality","knn_cosine","ann_lsh","a10_kde",
      "dd_embcos","w6_prefix","ts_langid","x_datetime")
    for (q <- (if (args.nonEmpty) args.toSeq else defaultQs)) {
      // warm
      try graft.SparkEntry.queries(q)(spark, src).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$q warm FAILED ${e.getMessage}") }
      for ((dir, label) <- Seq(src -> "sf0.1", out -> "sf1")) {
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(q)(dir match { case d => spark }, dir)
        } catch { case _: Throwable => }
        try {
          graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
          println(f"$q%-16s $label%-6s ${(System.nanoTime()-t0)/1e9}%8.2f s")
        } catch { case e: Throwable => println(s"$q $label FAILED ${e.getMessage.take(100)}") }
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
