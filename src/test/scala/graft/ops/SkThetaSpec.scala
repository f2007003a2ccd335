package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** sk_theta (KMV/theta sketch): values are end-to-end hash-gated by the
  * FNV-replay twin; pinned here are the properties the gate can't
  * express — the estimates actually LAND near the exact answers (an
  * arbitrarily wrong estimator would still hash-match its own twin),
  * the sketch state respects its k bound, and the intersection comes
  * from the sketch, not from an exact pass in disguise. */
class SkThetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def row(sf: String) =
    Sketches.queries("sk_theta")(spark, s"/root/testdata/$sf").collect().head

  test("estimates land near exact: <=15% on cardinalities, <=50% on the intersection") {
    val r = row("sf0.01")
    def rel(est: Double, exact: Long): Double =
      math.abs(est - exact) / exact.toDouble
    assert(rel(r.getAs[Double]("est_a"), r.getAs[Long]("x_a")) <= 0.15)
    assert(rel(r.getAs[Double]("est_b"), r.getAs[Long]("x_b")) <= 0.15)
    assert(rel(r.getAs[Double]("est_union"), r.getAs[Long]("x_union")) <= 0.15)
    // the intersection sample is ~θ-fraction of 71 true common shingles
    // (~13 draws at k=256 over ~1.4k-element sets): deterministic corpus,
    // measured 0.7% — 50% is the regression floor for the sample size
    assert(rel(r.getAs[Double]("est_inter"), r.getAs[Long]("x_inter")) <= 0.5)
  }

  test("sketch state is k-bounded and the theta-cut counts are sketch-sized") {
    val r = row("sf0.01")
    val k = r.getAs[Long]("k")
    assert(k == 256L)
    // the θ-cut union sample can never exceed the two sketches combined
    assert(r.getAs[Long]("n_union_sketch") <= 2 * k)
    assert(r.getAs[Long]("n_inter_sketch") <= k)
    // the sketch must be an actual sample: strictly fewer sub-θ values
    // than the exact union (θ < max hash), or the "sketch" is exact
    assert(r.getAs[Long]("n_union_sketch") < r.getAs[Long]("x_union"))
    // θ is a real 63-bit cut, not a degenerate full-set marker
    assert(r.getAs[Long]("theta") > 0 &&
      r.getAs[Long]("theta") < Long.MaxValue)
  }

  test("deterministic: two evaluations produce the identical row") {
    assert(row("sf0.001").toString == row("sf0.001").toString)
  }
}
