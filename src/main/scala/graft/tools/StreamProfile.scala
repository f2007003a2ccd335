package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the st_* gate costs (VERDICT r7 next §3):
  * tests minimal-micro-batch delivery shapes against the known-good
  * output counts before the gates adopt them. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val parts = sys.env.getOrElse("PROF_PARTS", "4")
    val s = graft.ops.ScopedSession(spark, s"stream-prof-$parts",
      "spark.sql.shuffle.partitions" -> parts)
    import s.implicits._
    implicit val ctx = s.sqlContext
    def mark(label: String)(f: => Unit): Unit = {
      val t = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }

    // ---- leftouter: batch1, batch2+s1, NO s2 ----
    {
      val evs = graft.io.Sources.table(s, sfDir, "events")
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[graft.streaming.EventStream.AsofEv].collect()
        .sortBy(e => (e.ts.getTime, e.event_id))
      val maxMs = evs.map(_.ts.getTime).max
      def sent(hop: Long) = IndexedSeq(
        graft.streaming.EventStream.AsofEv(-hop, -1L,
          new java.sql.Timestamp(maxMs + hop * 3600000L), "view", 0.0),
        graft.streaming.EventStream.AsofEv(-hop - 10L, -1L,
          new java.sql.Timestamp(maxMs + hop * 3600000L), "click", 0.0))
      val t0 = System.nanoTime()
      val source = MemoryStream[graft.streaming.EventStream.AsofEv]
      val q = graft.streaming.EventStream.clickViewLeftJoin(source.toDF())
        .writeStream.format("memory").queryName("prof_lo").outputMode("append")
        .option("checkpointLocation", s"/dev/shm/graft_stream/prof_${System.nanoTime()}")
        .start()
      val half = evs.length / 2
      mark("lo.batch1") { source.addData(evs.take(half).toIndexedSeq); q.processAllAvailable() }
      mark("lo.batch2+s1") { source.addData(evs.drop(half).toIndexedSeq ++ sent(1L)); q.processAllAvailable() }
      println("lo.out=" + s.table("prof_lo").filter(col("user_id") >= 0L).count() + " (want 19865)")
      q.stop()
      println(f"lo.total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // ---- sessions: ONE call (data + flush sentinel together) ----
    {
      val evs = graft.io.Sources.table(s, sfDir, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[graft.streaming.EventStream.Ev].collect()
      val maxMs = evs.map(_.ts.getTime).max
      val flushMs = maxMs + graft.streaming.EventStream.sessionGapUs / 1000L + 3600000L
      val t0 = System.nanoTime()
      val source = MemoryStream[graft.streaming.EventStream.Ev]
      val q = graft.streaming.EventStream.sessionize(s,
          source.toDS().withWatermark("ts", "0 seconds"))
        .writeStream.format("memory").queryName("prof_se").outputMode("append")
        .option("checkpointLocation", s"/dev/shm/graft_stream/prof_${System.nanoTime()}")
        .start()
      mark("se.batch1(all+flush)") {
        source.addData(evs.toIndexedSeq :+
          graft.streaming.EventStream.Ev(-1L, new java.sql.Timestamp(flushMs), "click", 0.0))
        q.processAllAvailable()
      }
      println("se.out=" + s.table("prof_se").filter(col("user_id") >= 0L).count())
      q.stop()
      println(f"se.total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
