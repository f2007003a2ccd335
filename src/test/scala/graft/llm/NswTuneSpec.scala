package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw_tune (the beam-width operating curve): the oracle gate
  * re-derives per-ef recall from the fixtures; pinned here is the
  * CURVE itself on the fixed corpus —
  *  - measured floors (sf0.001, measured-minus-margin): ef=1 ≥ 0.33
  *    (measured 0.533), ef=4 ≥ 0.73 (0.933), ef=8 ≥ 0.9 (1.0);
  *  - the low end MOVES (ef=1 recall < 1): the sweep actually spans
  *    the knee, so the gate can distinguish beam widths — an
  *    {8,16,32,64} sweep would certify a flat 1.0 line (r3 lesson);
  *  - recall is nondecreasing along the sweep (deterministic engine,
  *    fixed corpus — the measured curve is stable);
  *  - consistency: the tuned-default row (ef = nswEfSearch) reports
  *    EXACTLY the recall ann_nsw_recall measures for the production
  *    serve — the table prices the knob the serve actually uses. */
class NswTuneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = Similarity.queries("ann_nsw_tune")(spark, sf)
    .collect()
    .map(r => (r.getAs[Long]("ef_search"), r.getAs[Double]("recall")))
    .sortBy(_._1)

  test("sweep matches the engine constant and ends at the tuned default") {
    assert(rows.map(_._1) sameElements Similarity.nswTuneEfs.map(_.toLong).sorted)
    val (_, _, _, efS) = Similarity.nswTuning
    assert(rows.last._1 == efS.toLong,
      s"sweep must end at the serving default $efS, ends at ${rows.last._1}")
  }

  test("measured floors hold and the low end moves") {
    val byEf = rows.toMap
    assert(byEf(1L) >= 0.33, s"ef=1 recall ${byEf(1L)} under floor 0.33")
    assert(byEf(4L) >= 0.73, s"ef=4 recall ${byEf(4L)} under floor 0.73")
    assert(byEf(8L) >= 0.9, s"ef=8 recall ${byEf(8L)} under floor 0.9")
    assert(byEf(1L) < 1.0,
      "ef=1 recall is 1.0 - the sweep no longer spans the knee on this corpus")
  }

  test("recall is nondecreasing in ef (pinned measurement, ε-tolerant)") {
    // Beam search carries no monotonicity theorem — a wider ring can
    // admit a DIFFERENT live frontier, so strict nondecrease is a
    // measured fact of this corpus + nswTuning, not an invariant
    // (ADVICE r16). The ε admits parameter-retune wiggle while still
    // tripping on real regressions (an order-of-magnitude tableau
    // break drops recall by tenths, not hundredths).
    rows.sliding(2).foreach { case Array((e0, r0), (e1, r1)) =>
      assert(r1 >= r0 - 0.02, s"recall fell from $r0 (ef=$e0) to $r1 (ef=$e1)")
    }
  }

  test("the tuned-default row equals the production serve's recall") {
    val servedRecall = Similarity.queries("ann_nsw_recall")(spark, sf)
      .collect()(0).getAs[Double]("recall")
    assert(rows.last._2 == servedRecall,
      s"tune table says ${rows.last._2} at the default ef, the serve measures $servedRecall")
  }
}
