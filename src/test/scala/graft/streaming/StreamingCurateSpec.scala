package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.llm.Curate

/** Curation assignment on a stream: the split projection is stateless
  * (content-hash arithmetic, no state store, no watermark), so the SAME
  * code runs per micro-batch at ingest time — a doc gets its permanent
  * train/val/test home the moment it arrives, and the assignment agrees
  * with what a batch backfill over the same corpus would produce. */
class StreamingCurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming split assignment is batch-identical per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    val source = MemoryStream[(Long, String)]
    val q = Curate.splitAssign(
        source.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("split_out")
      .outputMode("append").start()
    try {
      // two micro-batches: assignment must not depend on batch boundaries
      source.addData(docs.take(20): _*)
      q.processAllAvailable()
      source.addData(docs.drop(20): _*)
      q.processAllAvailable()
      val streamed = spark.table("split_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = Curate.splitAssign(
          docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(streamed == batch)
      assert(streamed.size == docs.size)
    } finally q.stop()
  }
}
