package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dd_source_overlap: the oracle gate pins the signature algebra; this
  * spec pins what the sketch is FOR — that signature agreement really
  * estimates shingle-set Jaccard. Exact per-pair Jaccard is computed
  * independently in plain Scala over the true distinct shingle sets
  * and compared against the k=32 estimate (deterministic fixed perms,
  * so the measured error is stable, not a flaky sample). */
class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sketch estimate tracks exact shingle-set Jaccard per source pair") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val ts = t.split(" ", -1)
      if (ts.length < 3) Set.empty
      else (0 to ts.length - 3).map(j => s"${ts(j)} ${ts(j + 1)} ${ts(j + 2)}").toSet
    }
    val bySource = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(d => shingles(d._2)).toSet
    }
    val out = Dedup.queries("dd_source_overlap")(spark, sf).collect()
    val nSources = bySource.size
    assert(out.length == nSources * (nSources - 1) / 2,
      s"expected all ${nSources * (nSources - 1) / 2} source pairs, got ${out.length}")
    var maxErr = 0.0
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val (sa, sb) = (bySource(a), bySource(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val est = r.getAs[Long]("est_q") / 10000.0
      val matches = r.getAs[Long]("matches")
      assert(matches >= 0 && matches <= 32, s"$a/$b matches out of range")
      assert(r.getAs[Long]("est_q") == matches * 10000 / 32, s"$a/$b est_q algebra")
      maxErr = math.max(maxErr, math.abs(est - exact))
      // k = 32 one-hash affine perms: binomial std ≤ sqrt(.25/32) ≈ .088;
      // 0.25 is ~2.8σ — and the perms are FIXED, so this is a measured
      // property of this corpus, not a tail event
      assert(math.abs(est - exact) <= 0.25,
        f"$a/$b: estimate $est%.3f vs exact $exact%.3f — sketch broken")
    }
    assert(maxErr > 0.0 || out.exists(_.getAs[Long]("matches") > 0),
      "all-zero matrix with zero error — vacuous corpus")
  }
}
