package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** 10× streaming-ingest probe for st_enrich / st_sliding (VERDICT r10
  * next §5): the r9 10× probes measured both gates volume-linear,
  * dominated by MemoryStream staging and the MEMORY-SINK readback
  * (every output row collected to the driver, then re-uploaded via
  * createDataFrame). Round 11 replaced the readback with the
  * foreachBatch+writeBatch parquet sink — output stays on executors,
  * the readback is a distributed scan. This probe times BOTH sink
  * shapes over the same 10×-replicated event rows in one JVM, so the
  * recorded delta isolates the sink shape from host drift. The
  * residual MemoryStream staging cost is test scaffolding by
  * construction (a production source streams from Kafka/files,
  * partition-parallel); the sink side was the half the engine owns.
  *
  * Run: `sbt 'runMain graft.tools.StreamIngestProbe'` */
object StreamIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.ops.ScopedSession(spark, "ingest-probe",
      "spark.sql.shuffle.partitions" -> "4")
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.EventStream

    val base = graft.io.Sources.table(s, "/root/testdata/sf0.1", "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.Ev].collect()
    val evs = (0 until 10).flatMap(i =>
      base.map(e => e.copy(user_id = e.user_id + i * 1000000L)))
    val maxMs = evs.iterator.map(_.ts.getTime).max
    println(s"10x rows: ${evs.length}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val root = java.nio.file.Files.createTempDirectory("ingest_probe").toString
    var k = 0
    def ck(): String = { k += 1; s"$root/ckpt$k" }

    for (pass <- 1 to 2) {
      println(s"-- pass $pass --")
      // st_enrich shape, memory sink (the r9 gate shape)
      time("enrich memory-sink") {
        val source = MemoryStream[EventStream.Ev]
        val name = s"probe_mem_$pass"
        val q = EventStream.enrichWithBounds(source.toDF(),
            graft.ops.Relational.boundsDim(s))
          .writeStream.format("memory").queryName(name).outputMode("append")
          .option("checkpointLocation", ck()).start()
        try {
          source.addData(evs); q.processAllAvailable()
          val tbl = s.table(name)
          val rows = tbl.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), tbl.schema)
            .orderBy("user_id", "ts", "event_type")
            .write.format("noop").mode("overwrite").save()
          rows.length.toLong
        } finally q.stop()
      }
      // st_enrich shape, parquet writeBatch sink (the r11 gate shape)
      time("enrich parquet-sink") {
        val source = MemoryStream[EventStream.Ev]
        val out = s"$root/enrich_out_$pass"
        val q = EventStream.enrichWithBounds(source.toDF(),
            graft.ops.Relational.boundsDim(s))
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            EventStream.writeBatch(b.toDF(), id, out))
          .option("checkpointLocation", ck()).start()
        try {
          source.addData(evs); q.processAllAvailable()
          s.read.parquet(out).orderBy("user_id", "ts", "event_type")
            .write.format("noop").mode("overwrite").save()
          s.read.parquet(out).count()
        } finally q.stop()
      }
      // st_sliding shape, both sinks
      time("sliding memory-sink") {
        val source = MemoryStream[EventStream.Ev]
        val name = s"probe_slmem_$pass"
        val q = EventStream.slidingStats(source.toDF())
          .writeStream.format("memory").queryName(name).outputMode("append")
          .option("checkpointLocation", ck()).start()
        try {
          source.addData(evs :+ EventStream.Ev(-1L,
            new Timestamp(maxMs + 3L * 3600000L), "sentinel__", 0.0))
          q.processAllAvailable()
          val tbl = s.table(name)
          val rows = tbl.filter(!(col("event_type") <=> "sentinel__")).collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), tbl.schema)
            .orderBy("win_start", "event_type")
            .write.format("noop").mode("overwrite").save()
          rows.length.toLong
        } finally q.stop()
      }
      time("sliding parquet-sink") {
        val source = MemoryStream[EventStream.Ev]
        val out = s"$root/slide_out_$pass"
        val q = EventStream.slidingStats(source.toDF())
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            EventStream.writeBatch(b.toDF(), id, out))
          .option("checkpointLocation", ck()).start()
        try {
          source.addData(evs :+ EventStream.Ev(-1L,
            new Timestamp(maxMs + 3L * 3600000L), "sentinel__", 0.0))
          q.processAllAvailable()
          s.read.parquet(out).filter(!(col("event_type") <=> "sentinel__"))
            .orderBy("win_start", "event_type")
            .write.format("noop").mode("overwrite").save()
          s.read.parquet(out).count()
        } finally q.stop()
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
