package graft.tools

import org.apache.spark.sql.functions._

/** Mixed-corpus probe for dd_ppjoin_capped (VERDICT r15 next §4): the
  * r14/r15 100× replication probe saturates to the all-stars path
  * (every doc has 100 identical copies, so every prefix token is hot
  * and the md5 star carries everything) — it prices the viral regime
  * but says nothing about the cap's recall trade on NATURAL near-pairs
  * at scale. This probe builds a 100× corpus where viral and natural
  * near-pairs COEXIST:
  *
  *   - 100 "universes", each the sf0.1 documents with every token
  *     salted by the universe index (`tok~i`) and doc_ids offset by
  *     i·10⁶. Token salting is a per-universe bijection of the shingle
  *     alphabet, so within-universe jaccards — and therefore the true
  *     natural ≥τ pair set — are EXACTLY the sf0.1 ones, while
  *     universes share no shingles (collision-list widths stay at
  *     their 1× values: the cap's per-token census is scale-invariant
  *     by construction, and the probe verifies it).
  *   - the viral plant (doc_id % 10 = 3, preserved by the 10⁶ offset)
  *     is the same literal text in every universe, so the viral class
  *     is 50,000 docs wide — 100× the 1× class — and must route
  *     through the linear md5 star. The salting loop below touches
  *     viral rows too, but that stored text is IMMATERIAL: the gated
  *     pipeline's `viralDocs` re-plants the constant literal on
  *     doc_id % 10 = 3 at READ time (Dedup.scala `viralDocs`), after
  *     this parquet is scanned — so the cross-universe class survives
  *     regardless of what the writer stored (ADVICE r16: the measured
  *     census confirms it — 5 hot tokens and a 6.25e9 ≈ 5·C(50000,2)
  *     uncapped bound are the cross-universe signature; a fragmented
  *     per-universe plant would show 500 hot tokens and a ~62M bound).
  *
  * Reported per corpus (1× and 100×): natural-pair recall of the
  * capped join against the UNCAPPED exact join (run via the
  * graft.ppjoin.dfCap knob at 2³⁰ — lossless PPJoin — restricted to
  * pairs with no viral end, whose text the plant never touches; the
  * 100× exact count is 100× the 1× one by the bijection argument),
  * plus the width census (max width, hot tokens, uncapped candidate
  * bound, capped cold collisions) and the gated query's wall time.
  * The scale claim under test: natural recall at 100× equals natural
  * recall at 1× — the cap's recall trade does not degrade with corpus
  * size because collision lists are per-token, not per-corpus.
  *
  * Run: `sbt 'runMain graft.tools.PpjoinMixedProbe'` */
object PpjoinMixedProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/ppjoin_mixed"
    val universes = 100
    if (!new java.io.File(out + "/documents.parquet").exists) {
      new java.io.File(out).mkdirs()
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until universes).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", array_join(
            transform(split(col("text"), " "), t => concat(t, lit(s"~$i"))), " "))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"built $out (${universes}x salted universes of sf0.1 documents)")
    }

    // a pair is NATURAL iff neither end is a viral-plant id; the 10^6
    // universe offset preserves doc_id % 10, so one predicate serves
    // both corpora
    def naturalCount(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(pmod(col("doc_a"), lit(10)) =!= 3 && pmod(col("doc_b"), lit(10)) =!= 3)
        .count()

    def runGated(dir: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val res = graft.SparkEntry.queries("dd_ppjoin_capped")(spark, dir).persist()
      val nat = naturalCount(res)
      val sec = (System.nanoTime() - t0) / 1e9
      res.unpersist()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (nat, sec)
    }

    // exact baseline at 1x: the same pipeline with the cap effectively
    // off (2^30) IS lossless PPJoin — every true >= tau pair survives
    println("== exact (uncapped) natural baseline at 1x ==")
    spark.conf.set("graft.ppjoin.dfCap", (1 << 30).toString)
    val (exactNat1x, exactSec) = runGated(src)
    spark.conf.unset("graft.ppjoin.dfCap")
    println(f"1x     exact natural pairs = $exactNat1x%-8d ($exactSec%.1f s)")

    println("== capped runs ==")
    val (cappedNat1x, sec1x) = runGated(src)
    val r1 = cappedNat1x.toDouble / exactNat1x
    println(f"1x     capped natural = $cappedNat1x%-8d recall = $r1%.4f  wall = $sec1x%6.2f s")

    val (cappedNat100x, sec100x) = runGated(out)
    val exactNat100x = universes.toLong * exactNat1x
    val r100 = cappedNat100x.toDouble / exactNat100x
    println(f"100x   capped natural = $cappedNat100x%-8d of $exactNat100x expected " +
      f"recall = $r100%.4f  wall = $sec100x%6.2f s")

    // width census on the mixed corpus (the PpjoinCapProbe funnel):
    // per-token collision widths must sit at their 1x values for
    // natural tokens and at 100x only for the shared viral plant
    val cap = 16
    val t = graft.llm.Dedup.ppjoinShingleT(
      graft.llm.Dedup.ppjoinCapCorpus(spark, out)).persist()
    val pr = graft.llm.Dedup.ppjoinCapPrefixes(t).persist()
    val wid = pr.groupBy("tok").agg(count(lit(1)).as("w")).persist()
    val census = wid.agg(
      max(col("w")).as("max_w"),
      sum(when(col("w") > cap, 1L).otherwise(0L)).as("hot_toks"),
      max(when(col("w") <= cap, col("w"))).as("max_cold_w"),
      sum(col("w") * (col("w") - 1) / 2).as("uncapped_bound")).collect()(0)
    val cold = pr.join(
      broadcast(wid.filter(col("w") > cap).select("tok")), Seq("tok"), "left_anti")
    val coldRows = graft.llm.Dedup.ppjoinCapCollisions(cold).count()
    println(f"100x   max_w=${census.getAs[Long]("max_w")}%-7d " +
      f"hot=${census.getAs[Long]("hot_toks")}%-6d " +
      f"max_cold_w=${census.getAs[Long]("max_cold_w")}%-4d " +
      f"uncapped_bound=${census.getAs[Any]("uncapped_bound")}%-14s " +
      f"capped_collisions=$coldRows%-10d")
    spark.stop()
  }
}
