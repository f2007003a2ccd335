package graft.tools
import org.apache.spark.sql.functions._

/** Stage-level timing of the capped dd_minhash at the 100× corpus —
  * identifies the residual after the r10 bucket cap. Run:
  * `sbt 'runMain graft.tools.MinhashStageProbe'` (requires
  * /tmp/sf10docs from Doc100Probe). */
object MinhashStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/sf10docs/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    time("scan only") { docs.write.format("noop").mode("overwrite").save() }
    time("shingle explode count") {
      graft.llm.Dedup.shingleRows(docs).write.format("noop").mode("overwrite").save()
    }
    val sigs = time("signatures") {
      val s = graft.llm.Dedup.minhashSignatures(docs).persist()
      s.count(); s
    }
    val bandStructs = (0 until 4).map { bnd =>
      val cols = (bnd * 6 until (bnd + 1) * 6).map(i => col(s"h$i"))
      struct(lit(bnd).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val allBands = time("bands persist") {
      val b = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        .persist()
      b.count(); b
    }
    val widths = allBands.groupBy("band", "bucket").agg(count(lit(1)).as("bw"))
    time("widths + anti-join") {
      allBands.join(broadcast(widths.filter(col("bw") > 64)),
        Seq("band", "bucket"), "left_anti").write.format("noop").mode("overwrite").save()
    }
    time("overflow md5 + star") {
      val overDocs = allBands.join(broadcast(widths.filter(col("bw") > 64)),
        Seq("band", "bucket"), "left_semi").select("doc_id").distinct()
      val sigd = docs.join(overDocs, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("sig"))
      val starMin = sigd.groupBy("sig").agg(min(col("doc_id")).as("doc_a"))
      sigd.join(starMin, Seq("sig")).filter(col("doc_id") =!= col("doc_a"))
        .select(col("doc_a"), col("doc_id").as("doc_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
