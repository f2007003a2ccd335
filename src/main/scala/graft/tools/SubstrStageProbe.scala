package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.ArrayFns

/** Diagnostic stage breakdown of the dd_substr pipeline on the
  * SubstrScaleProbe corpus (every doc has one near-copy — worst-case
  * pairing): times each prefix of the pipeline cold, so the deltas
  * localize the dominant stage. The pipeline here mirrors
  * `Dedup.substrSpansImpl` inline (diagnostic copy — the gated
  * implementation stays the source of truth).
  *
  * Run: `sbt 'runMain graft.tools.SubstrStageProbe [nBase]'` */
object SubstrStageProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/substr_scale_$nBase"
    if (!new java.io.File(s"$dir/documents.parquet").exists) {
      // reuse the SubstrScaleProbe generator by invoking its corpus shape
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
        .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    def docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def sel = docs.select(col("doc_id"),
        explode(array_distinct(ArrayFns.winnowSel(col("text"), withPositions = true))).as("pf"))
      .select(col("doc_id"), expr("CAST(substr(pf, 1, 8) AS BIGINT)").as("pos"),
        xxhash64(expr("substr(pf, 10)")).as("fph"))
    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    timed("s1 sel (kernel+parse)") { sel }
    timed("s2 band agg") {
      sel.groupBy("fph").agg(countDistinct(col("doc_id")).as("nd"),
        count(lit(1)).as("occ"))
        .filter(col("nd").between(2, 32) && col("occ") <= 64).select("fph")
    }
    timed("s3 + semi + self-join") {
      val sp = sel.persist()
      val band = sp.groupBy("fph").agg(countDistinct(col("doc_id")).as("nd"),
        count(lit(1)).as("occ"))
        .filter(col("nd").between(2, 32) && col("occ") <= 64).select("fph")
      val banded = sp.join(band, Seq("fph"), "left_semi")
      banded.select(col("doc_id").as("doc_a"), col("pos").as("ap"), col("fph"))
        .join(banded.select(col("doc_id").as("doc_b"), col("pos").as("bp"), col("fph")), Seq("fph"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "ap", "bp")
    }
    timed("s4 + group + texts") {
      val sp = sel.persist()
      val band = sp.groupBy("fph").agg(countDistinct(col("doc_id")).as("nd"),
        count(lit(1)).as("occ"))
        .filter(col("nd").between(2, 32) && col("occ") <= 64).select("fph")
      val banded = sp.join(band, Seq("fph"), "left_semi")
      val seeds = banded.select(col("doc_id").as("doc_a"), col("pos").as("ap"), col("fph"))
        .join(banded.select(col("doc_id").as("doc_b"), col("pos").as("bp"), col("fph")), Seq("fph"))
        .filter(col("doc_a") < col("doc_b"))
      seeds.groupBy("doc_a", "doc_b")
        .agg(collect_list(struct(col("ap"), col("bp"))).as("sds"))
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
    }
    timed("s5 full dd_substr") {
      graft.SparkEntry.queries("dd_substr")(spark, dir)
    }
    spark.stop()
  }
}
