package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming erasure gate (st_rtbf): erasure requests arrive as a
  * stream, and the scrub must converge however the runtime batches
  * them. The oracle hash-checks the final ledger against dq_rtbf's
  * corpus twin; pinned here are the streaming claims — ledger
  * equality with the batch gate, split-delivery convergence ON THE
  * WRITTEN RELATIONS (not just the counts), and the untouched live
  * index. */
class StRtbfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val streamed =
    StreamQueries.queries("st_rtbf")(spark, sf).collect()

  test("streamed final ledger == the one-shot dq_rtbf ledger, row-exact") {
    val batch = graft.llm.Dedup.queries("dq_rtbf")(spark, sf).collect()
    def rows(a: Array[org.apache.spark.sql.Row]) =
      a.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed.nonEmpty && rows(streamed) == rows(batch),
      s"streamed ledger diverged: streamed ${rows(streamed)}, batch ${rows(batch)}")
  }

  test("split delivery converges on the written relations, not just counts") {
    streamed // drive the stream (two triggers, half the requests each)
    // the one-shot scrub into a scratch root with the FULL deletion set
    import spark.implicits._
    val idx = graft.llm.Dedup.ensureDedupIndexFor(spark, sf)
    val delAll = graft.llm.Dedup.incrCorpus(spark, sf)
      .filter(col("doc_id") % 20 === 5).select("doc_id")
    val scratch = StreamQueries.stRtbfRoot + "-oneshot"
    graft.llm.Dedup.rtbfScrub(spark, sf, idx, scratch, delAll).collect()
    Seq("hashes", "signatures", "winnow", "chunks").foreach { name =>
      val a = spark.read.parquet(s"${StreamQueries.stRtbfRoot}/$name")
        .collect().map(_.toString).sorted.toSeq
      val b = spark.read.parquet(s"$scratch/$name")
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name: streamed scrub != one-shot scrub")
    }
  }

  test("the live dedup index is untouched") {
    val idx = graft.llm.Dedup.ensureDedupIndexFor(spark, sf)
    val success = new java.io.File(s"$idx/hashes/_SUCCESS")
    assert(success.exists)
    val t0 = success.lastModified
    StreamQueries.queries("st_rtbf")(spark, sf).collect()
    assert(success.lastModified == t0, "the streamed scrub rewrote the live index")
  }
}
