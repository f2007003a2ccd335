package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** st_nsw_upsert (streaming NSW graph maintenance): the oracle gate
  * hash-checks scoring + ranking over the streamed fixture; pinned
  * here is the maintenance algebra only the stream can claim —
  * inserting the plant across TWO micro-batch triggers yields exactly
  * the candidate set the one-shot ann_nsw_upsert cogroup produces
  * (batch ids arrive in id order across triggers, so sequential
  * insertion composes to the same from-scratch-equivalent graph), and
  * every twin — whichever trigger carried it — surfaces at rank 1
  * with cosine exactly 1.0. */
class StNswUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (_, upsertOffset, nProbes, _, _) = graft.llm.Similarity.upsertConsts

  private lazy val served =
    StreamQueries.queries("st_nsw_upsert")(spark, sf).collect()

  test("streamed graph == one-shot upsert graph, candidate-exact") {
    served // run the stream first (dumps stnswup_cands)
    graft.llm.Similarity.queries("ann_nsw_upsert")(spark, sf).collect()
    def cands(fx: String): Set[(Long, Long)] =
      spark.read.parquet(s"/tmp/graft_fixtures/$fx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = cands("stnswup_cands")
    val oneShot = cands("annnswup_cands")
    assert(streamed.nonEmpty && streamed == oneShot,
      s"streamed graph diverged from the one-shot upsert: only-stream " +
        s"${(streamed -- oneShot).take(3)}, only-oneshot ${(oneShot -- streamed).take(3)}")
  }

  test("freshness across triggers: every probe's twin at rank 1, sim 1.0") {
    val rank1 = served.filter(_.getAs[Int]("rk") == 1)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    assert(rank1.length == nProbes)
    rank1.foreach { case (qid, cid, sim) =>
      assert(cid == qid + upsertOffset && sim == 1.0,
        s"probe $qid: rank-1 is ($cid, $sim), want its streamed twin at 1.0")
    }
  }
}
