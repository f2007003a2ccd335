package graft.tools

import org.apache.spark.sql.functions._

/** Collision-list funnel for dd_ppjoin_capped (VERDICT r14 next §4's
  * "probe row showing bounded collision lists"): on the 100×-replicated
  * corpus (Doc100Probe's /tmp/sf10docs — every doc has 100 id-offset
  * copies, so EVERY prefix token's collision list is ≥ the copy count
  * and the viral class is 50k wide) the probe prints, per scale:
  *
  *   - the width census: max prefix-collision-list width, hot-token
  *     count (w > cap);
  *   - the UNCAPPED candidate bound Σ C(w,2) — the pair volume the
  *     lossless join would be forced to verify;
  *   - the CAPPED actual: collision rows from cold prefixes only
  *     (bounded by Σ C(min(w,cap),2)) + linear star edges;
  *   - the wall time of the full gated query.
  *
  * Run: `sbt 'runMain graft.tools.PpjoinCapProbe'` */
object PpjoinCapProbe {
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
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings"))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      println("built /tmp/sf10docs (500k documents)")
    }
    val cap = 16
    for ((dir, label) <- Seq(src -> "sf0.1", out -> "100x")) {
      val t = graft.llm.Dedup.ppjoinShingleT(
        graft.llm.Dedup.ppjoinCapCorpus(spark, dir)).persist()
      val pr = graft.llm.Dedup.ppjoinCapPrefixes(t).persist()
      val wid = pr.groupBy("tok").agg(count(lit(1)).as("w")).persist()
      val census = wid.agg(
        max(col("w")).as("max_w"),
        sum(when(col("w") > cap, 1L).otherwise(0L)).as("hot_toks"),
        sum(col("w") * (col("w") - 1) / 2).as("uncapped_bound"),
        sum(when(col("w") <= cap, col("w") * (col("w") - 1) / 2)
          .otherwise(0L)).as("cold_bound")).collect()(0)
      val cold = pr.join(
        broadcast(wid.filter(col("w") > cap).select("tok")), Seq("tok"), "left_anti")
      val coldRows = graft.llm.Dedup.ppjoinCapCollisions(cold).count()
      println(f"$label%-6s max_w=${census.getAs[Long]("max_w")}%-7d " +
        f"hot=${census.getAs[Long]("hot_toks")}%-6d " +
        f"uncapped_bound=${census.getAs[Any]("uncapped_bound")}%-14s " +
        f"capped_collisions=$coldRows%-10d")
      wid.unpersist(); pr.unpersist(); t.unpersist()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("dd_ppjoin_capped")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$label%-6s dd_ppjoin_capped full query ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
