package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The streaming CDC graph-maintenance gate (st_nsw_compact): the
  * streamed upsert→delete→sweep state equals the one-shot batch
  * pipeline (insert all, then the ann_nsw_compact sweep) row-exactly;
  * storage really shrinks at the sweep output; the served top-k
  * equals ann_nsw_lifecycle's mark-delete serve over the UNSWEPT
  * upserted graph — compaction serve-neutrality (NswCompactSpec)
  * composed with insertion-order construction (StNswUpsertSpec); and
  * (r18, VERDICT r17 next §4) the sweep CONVERGES under split
  * tombstone delivery: sweeping at t1 then at t1∪t2 yields the same
  * graph as one-shot delivery, because every sweep recomputes from
  * the unswept mainline. Like the sibling specs, the cross-gate
  * equalities are PINNED MEASUREMENTS of this corpus + nswTuning. */
class StNswCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val served =
    StreamQueries.queries("st_nsw_compact")(spark, sf).collect()
  private lazy val root = StreamQueries.stNswCompactRoot
  // resolve versions from the directory, NOT from a hard-coded trigger
  // count (the ADVICE r16 st_nsw_upsert lesson: how many micro-batches
  // MemoryStream makes of an addData call is a runtime detail)
  private def versionsOf(prefix: String) = {
    served
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName.stripPrefix(prefix).toInt).sorted
  }
  private lazy val mainVersions = versionsOf("live_")
  private lazy val sweptVersions = versionsOf("swept_")

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.select("shard", "pos", "vec_id", "ven", "adj").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getSeq[Double](3), r.getSeq[Int](4))).toSet

  private def upsertBatch = {
    val (plantN, upsertOffset, _, _, _) = graft.llm.Similarity.upsertConsts
    graft.io.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
      .filter(col("vec_id") < plantN)
      .select((col("vec_id") + upsertOffset).as("vec_id"),
        transform(col("ve"), x => x * 2.0).as("ve"))
  }

  private def oneShotSwept = {
    val nShards = graft.llm.Similarity.nswShardCountFor(spark, sf)
    val upserted = graft.llm.Similarity.nswGraphInsert(
      spark, graft.llm.Similarity.nswBaseGraph(spark, sf), upsertBatch, nShards)
    val tots = upserted.agg(count(lit(1)).as("n"),
      sum(when(graft.llm.Similarity.isTombstoned(col("vec_id")), 1L)
        .otherwise(0L)).as("nd")).collect()(0)
    graft.llm.Similarity.nswCompact(
      spark, upserted, graft.llm.Similarity.tombstonedIdFor,
      tots.getLong(0), tots.getLong(1))
  }

  test("streamed swept graph == one-shot insert + compact, row-exact") {
    served // drive the stream; leaves live_* mainline + swept_* outputs
    assert(sweptVersions.nonEmpty, "the stream never swept")
    val streamed = rowSet(
      spark.read.parquet(s"$root/swept_${sweptVersions.last}"))
    val oneShot = rowSet(oneShotSwept)
    assert(streamed == oneShot,
      s"streamed sweep diverged from one-shot: only-streamed " +
        s"${(streamed -- oneShot).take(2).map(t => (t._1, t._2, t._3))}, " +
        s"only-one-shot ${(oneShot -- streamed).take(2).map(t => (t._1, t._2, t._3))}")
  }

  test("the sweep output really shrinks storage vs the mainline tip") {
    assert(mainVersions.length >= 2, s"expected base+insert, saw $mainVersions")
    val mainTip = spark.read.parquet(s"$root/live_${mainVersions.last}").count()
    val sweptTip = spark.read.parquet(s"$root/swept_${sweptVersions.last}").count()
    assert(sweptTip < mainTip,
      s"sweep did not shrink the serving graph: $mainTip -> $sweptTip")
  }

  test("split tombstone delivery converges to the one-shot sweep") {
    // drive the fold DIRECTLY with a deliberately split delete batch:
    // sweep at t1, then at t1∪t2 — the r18 idempotence claim is that
    // the second sweep recomputes from the unswept mainline, so the
    // final graph equals one-shot delivery row-exactly
    val deletes = graft.io.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0))
      .filter(graft.llm.Similarity.tombstonedIdFor).sorted
    assert(deletes.length >= 2, "need at least two tombstones to split")
    val (t1, t2) = deletes.splitAt(deletes.length / 2)
    val state = new StreamQueries.NswCdcState(spark,
      s"$root-split", graft.llm.Similarity.nswBaseGraph(spark, sf),
      graft.llm.Similarity.nswShardCountFor(spark, sf))
    state.insert(upsertBatch)
    state.delete(t1)
    val afterT1 = rowSet(state.serving)
    state.delete(t2)
    val split = rowSet(state.serving)
    val oneShot = rowSet(oneShotSwept)
    assert(split == oneShot,
      s"split delivery diverged from one-shot: only-split " +
        s"${(split -- oneShot).take(2).map(t => (t._1, t._2, t._3))}, " +
        s"only-one-shot ${(oneShot -- split).take(2).map(t => (t._1, t._2, t._3))}")
    // and the intermediate sweep really was partial (the case is live)
    assert(afterT1 != split, "the t1 sweep already equaled the full sweep")
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
