package graft.tools

import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

/** Measures what the z-order layout buys: for three physical layouts
  * of the same events table (time-sorted, user-sorted, z-ordered by
  * both) and three predicate shapes (user slice, time slice, both),
  * counts the parquet row groups whose footer min/max statistics
  * overlap the predicate — i.e. the row groups a stats-pruning reader
  * (Spark, DuckDB, Trino alike) must actually read. Deterministic
  * evidence, no timing noise. Results recorded in BASELINE.md.
  *
  * The time dimension is materialized as an epoch-seconds long column
  * so the footer statistics under measurement are plain INT64 on
  * every engine (timestamp physical encodings vary). */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val files = 32
    val base = "/tmp/graft_zorder_probe"

    val src = graft.io.Sources.table(spark, sf, "events")
      .withColumn("ts_s", unix_timestamp(col("ts"))).drop("ts")

    val layouts = Seq(
      "time_sorted" -> ((out: String) =>
        src.repartitionByRange(files, col("ts_s"))
          .sortWithinPartitions("ts_s")
          .write.mode("overwrite").parquet(out)),
      "user_sorted" -> ((out: String) =>
        src.repartitionByRange(files, col("user_id"))
          .sortWithinPartitions("user_id")
          .write.mode("overwrite").parquet(out)),
      "zorder" -> ((out: String) =>
        graft.ops.Layout.zorderWrite(src, Seq("user_id", "ts_s"), out, files)),
      "zorder3" -> ((out: String) =>
        graft.ops.Layout.zorderWriteBudgeted(src,
          Seq("user_id" -> 16, "ts_s" -> 24, "event_id" -> 16), out, files)))
    layouts.foreach { case (name, write) => write(s"$base/$name") }

    // predicate bounds: a ~1.4% user slice, a ~13% time slice, and a
    // 10% event_id slice (the 3-dim layout's third dimension)
    val (uLo, uHi) = (100L, 120L)
    val (tLo, tHi) = (1704844800L, 1705190400L) // 2024-01-10 .. 01-14 UTC
    val (eLo, eHi) = (20000L, 29999L)

    def stats(dir: String): Seq[Map[String, (Long, Long)]] = {
      val fs = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      fs.toSeq.flatMap { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          b.getColumns.asScala
            .filter(c => Set("user_id", "ts_s", "event_id")(c.getPath.toDotString))
            .map(c => c.getPath.toDotString ->
              (c.getStatistics.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                c.getStatistics.genericGetMax.asInstanceOf[java.lang.Long].longValue))
            .toMap
        } finally r.close()
      }
    }

    // user slice is BETWEEN (inclusive); time slice models zo_events'
    // half-open [tLo, tHi) — a block starting exactly at tHi is prunable
    def userHit(s: Map[String, (Long, Long)]) =
      s("user_id")._1 <= uHi && s("user_id")._2 >= uLo
    def timeHit(s: Map[String, (Long, Long)]) =
      s("ts_s")._1 < tHi && s("ts_s")._2 >= tLo
    def evtHit(s: Map[String, (Long, Long)]) =
      s("event_id")._1 <= eHi && s("event_id")._2 >= eLo

    println(f"${"layout"}%-12s ${"user-slice"}%-12s ${"time-slice"}%-12s " +
      f"${"evt-slice"}%-12s ${"user+time"}%-12s all3")
    layouts.foreach { case (name, _) =>
      val blocks = stats(s"$base/$name")
      val n = blocks.size
      val u = blocks.count(userHit)
      val t = blocks.count(timeHit)
      val e = blocks.count(evtHit)
      val b = blocks.count(s => userHit(s) && timeHit(s))
      val a = blocks.count(s => userHit(s) && timeHit(s) && evtHit(s))
      println(f"$name%-12s $u%3d/$n%-8d $t%3d/$n%-8d $e%3d/$n%-8d $b%3d/$n%-8d $a%3d/$n")
    }
    spark.stop()
  }
}
