package graft.tools

/** Fresh-JVM tokenizer-encode probe (VERDICT r9 next §2 "done"
  * criterion): `run / fork := true` gives every invocation a new JVM,
  * so the in-process vocab caches start empty — the encodes below can
  * only be fast if they load the [[graft.llm.VocabStore]] parquet
  * artifacts instead of retraining (bpe_train+wp_train+unigram EM
  * together cost ~25 s at sf0.1; artifact-backed encodes run in the
  * broadcast-join floor). Pass `--retrain` to time the cold path for
  * the comparison row.
  *
  * Run: `sbt 'runMain graft.tools.TokenizerWarmProbe [--retrain]'` */
object TokenizerWarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    if (args.contains("--retrain"))
      for (fam <- Seq("bpe", "wp", "unigram")) {
        val p = graft.llm.VocabStore.path(d, fam)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        println(s"deleted $p")
      }
    for (q <- Seq("bpe_encode", "wp_encode", "tok_unigram_encode")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"$q%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s (fresh JVM)")
    }
    spark.stop()
  }
}
