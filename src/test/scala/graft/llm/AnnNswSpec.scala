package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw (sharded navigable-small-world graph ANN): the oracle gate
  * hash-checks scoring + ranking over the dumped candidate fixture;
  * what it cannot see — pinned here — is that the graph build and beam
  * search are deterministic (run-stable fixture), that recall against
  * the exact top-k clears a floor, and that the serving fan-out is
  * bounded by shards × ef (per-query work independent of table size —
  * the property that makes the sharded layout the 100 TB scale path). */
class AnnNswSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("deterministic: two builds serve the identical top-k") {
    val a = Similarity.queries("ann_nsw")(spark, sf).collect().map(_.toString).toSeq
    val b = Similarity.queries("ann_nsw")(spark, sf).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b, "graph build or beam search is run-unstable")
  }

  test("recall >= 0.8 vs the exact top-k; fan-out bounded by shards x ef") {
    val r = Similarity.queries("ann_nsw_recall")(spark, sf).collect().head
    val recall = r.getAs[Double]("recall")
    assert(recall >= 0.8, s"NSW recall degraded: $recall")
    // the candidate fixture the query just dumped: per probe at most
    // nswShards x nswEfSearch candidates — serving cost scales with the
    // shard count, never with the number of vectors
    val cands = spark.read.parquet("/tmp/graft_fixtures/annnsw_cands")
    val nProbes = 5; val shards = 8; val ef = 32
    val worst = cands.groupBy("qid").count().collect().map(_.getLong(1)).max
    assert(worst <= shards.toLong * ef,
      s"per-probe fan-out $worst exceeds shards*ef = ${shards * ef}")
    assert(cands.count() <= nProbes.toLong * shards * ef)
  }
}
