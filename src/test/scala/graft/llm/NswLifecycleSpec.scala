package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw_lifecycle (upsert + delete + serve composed over one
  * persisted NSW graph): the oracle hash-checks scoring + ranking with
  * the tombstone re-applied; pinned here is what only the COMPOSITION
  * can claim —
  *  - tombstoned probes lose their originals but their freshly-
  *    upserted ×2 twins still surface at rank 1 with cosine exactly
  *    1.0 (the insert reached every shard AND the delete spared the
  *    new arrivals);
  *  - no tombstoned id surfaces anywhere;
  *  - the persisted graph is untouched (maintenance, not rebuild). */
class NswLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (plantN, upsertOffset, nProbes, _, _) = Similarity.upsertConsts

  private lazy val served =
    Similarity.queries("ann_nsw_lifecycle")(spark, sf).collect()

  test("every probe's x2 twin is rank 1 at sim 1.0 — even tombstoned probes'") {
    val rank1 = served.filter(_.getAs[Int]("rk") == 1)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    assert(rank1.length == nProbes)
    rank1.foreach { case (qid, cid, sim) =>
      assert(cid == qid + upsertOffset && sim == 1.0,
        s"probe $qid: rank-1 is ($cid, $sim), want its upserted twin at 1.0")
    }
    // the claim is non-vacuous only if some probe IS tombstoned
    assert((0L until nProbes.toLong).exists(Similarity.tombstonedId),
      "no probe is tombstoned - the composition claim is vacuous")
  }

  test("soundness: no tombstoned id in the top-k nor in the candidate fixture") {
    served
    served.foreach(r => assert(!Similarity.tombstonedId(r.getAs[Long]("cid"))))
    val cids = spark.read.parquet("/tmp/graft_fixtures/annnswlc_cands")
      .collect().map(_.getAs[Long]("cid"))
    assert(cids.nonEmpty && !cids.exists(Similarity.tombstonedId))
    // and the upserted ids really flowed through the ring
    assert(cids.exists(_ >= upsertOffset), "no upserted id among the candidates")
  }

  test("maintenance, not rebuild: the persisted graph is untouched") {
    val success = new java.io.File(
      Similarity.nswIndexPathFor(sf) + "/graph/_SUCCESS")
    served
    assert(success.exists)
    val t0 = success.lastModified
    Similarity.queries("ann_nsw_lifecycle")(spark, sf).collect()
    assert(success.lastModified == t0, "the lifecycle serve rebuilt the persisted graph")
  }
}
