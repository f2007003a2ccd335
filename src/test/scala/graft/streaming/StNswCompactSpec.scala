package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The streaming CDC graph-maintenance gate (st_nsw_compact): the
  * streamed upsert→delete→sweep state equals the one-shot batch
  * pipeline (insert all, then the ann_nsw_compact sweep) row-exactly;
  * storage really shrinks at the sweep version; and the served top-k
  * equals ann_nsw_lifecycle's mark-delete serve over the UNSWEPT
  * upserted graph — compaction serve-neutrality (NswCompactSpec)
  * composed with insertion-order construction (StNswUpsertSpec). Like
  * those specs, the cross-gate equalities are PINNED MEASUREMENTS of
  * this corpus + nswTuning. */
class StNswCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val served =
    StreamQueries.queries("st_nsw_compact")(spark, sf).collect()
  private lazy val root = StreamQueries.stNswCompactRoot
  // resolve versions from the directory, NOT from a hard-coded trigger
  // count (the ADVICE r16 st_nsw_upsert lesson: how many micro-batches
  // MemoryStream makes of an addData call is a runtime detail)
  private lazy val versions = {
    served
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("live_"))
      .map(_.getName.stripPrefix("live_").toInt).sorted
  }
  private def live(v: Int) = spark.read.parquet(s"$root/live_$v")

  test("streamed swept graph == one-shot insert + compact, row-exact") {
    served // drive the stream; leaves live_0..live_2 behind
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "pos", "vec_id", "ven", "adj").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getSeq[Double](3), r.getSeq[Int](4))).toSet
    val streamed = rowSet(live(versions.last))
    val (plantN, upsertOffset, _, _, _) = graft.llm.Similarity.upsertConsts
    val batch = graft.io.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
      .filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
    val upserted = graft.llm.Similarity.nswGraphInsert(
      spark, graft.llm.Similarity.nswBaseGraph(spark, sf), batch)
    val tots = upserted.agg(count(lit(1)).as("n"),
      sum(when(col("vec_id") < plantN && pmod(col("vec_id"), lit(3)) === 0, 1L)
        .otherwise(0L)).as("nd")).collect()(0)
    val oneShot = rowSet(graft.llm.Similarity.nswCompact(
      spark, upserted, graft.llm.Similarity.tombstonedIdFor,
      tots.getLong(0), tots.getLong(1)))
    assert(streamed == oneShot,
      s"streamed sweep diverged from one-shot: only-streamed " +
        s"${(streamed -- oneShot).take(2).map(t => (t._1, t._2, t._3))}, " +
        s"only-one-shot ${(oneShot -- streamed).take(2).map(t => (t._1, t._2, t._3))}")
  }

  test("the sweep version really shrinks storage") {
    // the last version is the sweep's output; its predecessor is the
    // fully-upserted pre-sweep graph
    assert(versions.length >= 3, s"expected base+insert+sweep, saw $versions")
    val preSweep = live(versions(versions.length - 2)).count()
    val postSweep = live(versions.last).count()
    assert(postSweep < preSweep,
      s"sweep did not shrink the live graph: $preSweep -> $postSweep")
  }

  test("no tombstoned id surfaces in the served top-k") {
    served.foreach { r =>
      assert(!graft.llm.Similarity.tombstonedIdFor(r.getAs[Long]("cid")),
        s"dead id served: $r")
    }
  }

  test("served top-k == ann_nsw_lifecycle's mark-delete serve (pinned measurement)") {
    val mine = served
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk"), r.getAs[Long]("cid")))
      .toSet
    val lifecycle = graft.llm.Similarity.queries("ann_nsw_lifecycle")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk"), r.getAs[Long]("cid")))
      .toSet
    assert(mine == lifecycle,
      s"streamed-swept serve diverged from the batch lifecycle: only-stream " +
        s"${(mine -- lifecycle).take(3)}, only-lifecycle ${(lifecycle -- mine).take(3)}")
  }
}
