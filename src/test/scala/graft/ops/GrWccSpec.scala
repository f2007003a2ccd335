package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** gr_wcc (weakly connected components over the planted chain+bridge
  * graph): the oracle gate hash-checks the rollup; pinned here is the
  * STRUCTURE the plant guarantees — the star algorithm must collapse
  * diameter-19 chains exactly, merge precisely the bridged decade
  * pairs, and lose no node. */
class GrWccSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("500-doc corpus: 45 components, bridges merge exactly decades 5&6 per century") {
    val rows = Graph.queries("gr_wcc")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 45, s"expected 45 components, got ${rows.length}")
    val sizes = rows.map(r => (r.getAs[Long]("comp_id"), r.getAs[Long]("n_nodes")))
    assert(sizes.map(_._2).sum == 500, "a node fell out of the labelling")
    val merged = sizes.filter(_._2 == 20L).map(_._1).sorted
    assert(merged.toSeq == Seq(50L, 150L, 250L, 350L, 450L),
      s"bridged components wrong: ${merged.toSeq}")
    assert(sizes.count(_._2 == 10L) == 40, "unbridged decades must stay size 10")
    // every component's id is its minimum node: a decade start
    assert(sizes.forall(_._1 % 10 == 0), "comp_id must be the min node of a decade")
    // max_node closes the interval: comp_id + 9 (size 10) or + 19 (bridged)
    rows.foreach { r =>
      val (c, n, m) = (r.getAs[Long]("comp_id"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("max_node"))
      assert(m == c + n - 1, s"component $c not a contiguous interval: max=$m n=$n")
    }
  }

  test("gr_wcc_incr: incremental labelling equals from-scratch; the star rounds " +
    "run on the contracted graph, not the corpus") {
    val sf = "/root/testdata/sf0.001"
    val incr = Graph.queries("gr_wcc_incr")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val full = Graph.queries("gr_wcc")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(incr == full, "incremental CC diverged from the from-scratch labelling")
    // the scale claim: the quotient graph the increment pays for is
    // batch-sized. Recompute its node census directly from the plant:
    // batch edges = 50 x8→x9 links + 5 bridges at sf0.001 (500 docs) →
    // quotient nodes ≤ 2·55, vs 500 corpus nodes
    import org.apache.spark.sql.functions._
    val docs = graft.io.Sources.table(spark, sf, "documents").select("doc_id")
    val nBatch = docs.filter(col("doc_id") % 10 === 8).count() +
      docs.filter(col("doc_id") % 100 === 50).count()
    assert(nBatch * 2 < docs.count() / 4,
      s"plant regression: the batch (${nBatch} edges) is no longer small vs the corpus")
  }
}
