package graft.tools

import org.apache.spark.sql.functions._

/** 10× file-stream source probe for st_enrich_file (round 13): the
  * gate runs the landing-directory deployment shape at sf0.01; this
  * probe measures the shape the knob actually controls at scale —
  * micro-batch SIZE (maxFilesPerTrigger) against per-batch overhead
  * (offset-log commit + sink commit per trigger). 10× sf0.1 events
  * (~6M rows) staged as 32 parquet files, consumed with
  * maxFilesPerTrigger ∈ {32 (one batch), 8, 2} through the
  * stream-static broadcast enrichment and the idempotent batch_id
  * parquet sink — same operators as the gate, no driver collect
  * anywhere. The interesting number is rows/s vs trigger size: the
  * per-trigger overhead is CONSTANT (state-free operator, offset log
  * O(1)), so halving trigger size should cost a fixed ~per-batch tax,
  * not scale with data — if it doesn't, the sink or source is doing
  * per-batch work proportional to the whole directory.
  *
  * Run: `sbt 'runMain graft.tools.FileStreamProbe'` */
object FileStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.ops.ScopedSession(spark, "fsprobe",
      "spark.sql.shuffle.partitions" -> "8")

    val root = "/dev/shm/graft_fsprobe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val src = s"$root/landing"
    val base = graft.io.Sources.table(s, "/root/testdata/sf0.1", "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    base.crossJoin(spark.range(10).select(col("id").as("rep")))
      .select((col("user_id") + col("rep") * 1000000L).as("user_id"),
        col("ts"), col("event_type"), col("value"))
      .repartition(32)
      .write.mode("overwrite").parquet(src)
    val n = s.read.parquet(src).count()
    println(s"staged $n rows in 32 files")
    val schema = s.read.parquet(src).schema

    for (pass <- 1 to 2; mfpt <- Seq(32, 8, 2)) {
      val out = s"$root/out_${pass}_$mfpt"
      val ck = s"$root/ck_${pass}_$mfpt"
      val in = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", mfpt.toString).parquet(src)
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStream
        .enrichWithBounds(in, graft.ops.Relational.boundsDim(s))
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          graft.streaming.EventStream.writeBatch(b.toDF(), id, out))
        .option("checkpointLocation", ck).start()
      q.processAllAvailable()
      q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val batches = Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("batch_id="))
      println(f"pass $pass maxFilesPerTrigger=$mfpt%2d: $sec%7.2f s  " +
        f"(${n / sec / 1e6}%.2f M rows/s, $batches batches, " +
        f"${sec / batches}%.2f s/batch)")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
