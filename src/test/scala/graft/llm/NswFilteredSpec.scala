package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw_filtered (label-filtered graph serve): the oracle
  * hash-checks scoring + ranking with the label predicate re-applied;
  * pinned here are the serve-side claims — soundness (no wrong-label
  * candidate anywhere in the fixture, not just the top-k), full-k
  * answers for every probe, the filter being load-bearing (the
  * filtered top-k actually differs from the unfiltered serve), and
  * the measured recall of the filtered beam against the exact
  * filtered top-k on this corpus + tuning. */
class NswFilteredSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val served =
    Similarity.queries("ann_nsw_filtered")(spark, sf).collect()

  private lazy val labels: Map[Long, Long] =
    graft.io.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("soundness: every fixture candidate carries the probe's label") {
    served // dumps the fixture
    val cands = spark.read.parquet("/tmp/graft_fixtures/annnswfiltered_cands")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.nonEmpty)
    cands.foreach { case (qid, cid) =>
      assert(labels(cid) == labels(qid),
        s"wrong-label candidate leaked: probe $qid (label ${labels(qid)}) " +
          s"got $cid (label ${labels(cid)})")
    }
  }

  test("every probe answered at full k, qlabel column correct") {
    val (_, _, nProbes, _, k) = Similarity.upsertConsts
    val byQ = served.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == nProbes)
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == k, s"probe $qid answered ${rows.length} of $k")
      rows.foreach(r => assert(r.getAs[Long]("qlabel") == labels(qid)))
    }
  }

  test("the filter is load-bearing: filtered top-k differs from unfiltered serve") {
    val filtered = served
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val unfiltered = Similarity.queries("ann_nsw_serve")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(filtered != unfiltered,
      "filtered and unfiltered top-k are identical — the gate gates nothing")
  }

  test("measured recall: the filtered beam finds the exact filtered top-k (this corpus + tuning)") {
    val row = Similarity.queries("ann_nsw_filtered_recall")(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_exact") > 0)
    // near-exhaustive ef (32) over ~60-node shards with ~1/10 label
    // density: a PINNED MEASUREMENT of this corpus, not an invariant
    assert(row.getAs[Double]("recall") >= 0.9,
      s"filtered recall fell below the measured floor: $row")
  }
}
