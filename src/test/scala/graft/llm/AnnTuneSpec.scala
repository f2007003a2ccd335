package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_tune's structural guarantees: recall is monotone non-decreasing
  * in nProbe (the serving metric IS the exact metric, so a wider probe
  * ring can only improve the served top-k), the curve genuinely moves
  * (a flat curve would mean the probe ring isn't doing anything), and
  * every setting serves at most k rows per probe. */
class AnnTuneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("recall monotone in nProbe, curve non-degenerate, served volume bounded") {
    val rows = Similarity.queries("ann_tune")(spark, "/root/testdata/sf0.01")
      .collect().sortBy(_.getAs[Long]("n_probe"))
    assert(rows.map(_.getAs[Long]("n_probe")).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"recall regressed with a wider probe ring: $recalls")
    }
    assert(recalls.last > recalls.head, s"flat curve: $recalls")
    val nExact = rows.head.getAs[Long]("n_exact")
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_served"))
      assert(r.getAs[Long]("n_served") <= nExact) // ≤ k per probe
    }
  }
}
