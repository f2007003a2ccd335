package graft.tools

import org.apache.spark.sql.functions._

/** dd_substr family probe that exercises the EXTEND stage at scale —
  * the 100×-replication corpus (Doc100Probe) correctly bands out every
  * fingerprint (df ≥ 100 > 32), so its rows measure only the seed
  * build; this probe builds the adversarial-for-extension corpus
  * instead: nBase unique 80-token documents plus ONE 10%-insert mutant
  * each (token vocab unique per doc ⇒ every shared fingerprint has
  * df exactly 2, nothing bands out), so the seed self-join, the
  * per-pair text join, and the native SubstrExtend diagonal walk all
  * run at full width. Every pair shares ~8 inter-insert token runs
  * ≥ 24 cps, so the span output is ~8·nBase rows — the detection is
  * real work, not an empty relation.
  *
  * Run: `sbt 'runMain graft.tools.SubstrScaleProbe [nBase]'`
  * (default 250000 → 500k docs). */
object SubstrScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(250000)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = s"/tmp/substr_scale_$nBase"
    if (!new java.io.File(s"$out/documents.parquet").exists) {
      val base = spark.range(nBase).select(col("id").as("k"),
        array_join(transform(sequence(lit(0), lit(79)),
          i => concat(lit("d"), col("id"), lit("t"), i)), " ").as("text"))
      val mutant = spark.range(nBase).select(col("id").as("k"),
        array_join(flatten(transform(sequence(lit(0), lit(79)),
          i => when((i + 1) % 10 === 0,
              array(concat(lit("d"), col("id"), lit("t"), i),
                concat(lit("x"), col("id"), lit("i"), i)))
            .otherwise(array(concat(lit("d"), col("id"), lit("t"), i))))), " ")
          .as("text"))
      base.select(col("k").as("doc_id"), col("text"))
        .unionByName(mutant.select((col("k") + nBase).as("doc_id"), col("text")))
        .selectExpr("doc_id", "text", "'en' AS lang", "'probe' AS source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"built $out (${2 * nBase} documents)")
    }
    for (q <- Seq("dd_substr", "dd_substr_cov", "dd_substr_scrub")) {
      val t0 = System.nanoTime()
      // noop WRITE, not count(): a count over the coverage/scrub left
      // joins lets Catalyst eliminate the whole span side (unique-key
      // outer join under a column-pruned count) and times nothing
      val df = graft.SparkEntry.queries(q)(spark, out)
      df.write.format("noop").mode("overwrite").save()
      println(f"$q%-18s ${2 * nBase}%7d docs  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
