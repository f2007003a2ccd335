package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan-shape assertions for the dd_substr family — the scale claims
  * the operator doc makes, checked against real plans (the
  * Round9PlanSpec discipline): pairing is fp-keyed, NEVER an all-pairs
  * cartesian; document texts enter the plan only through the
  * output-sensitive pair join; the seed relation dedups in the array
  * domain (no corpus-wide dropDuplicates exchange). */
class SubstrPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("dd_substr: no cartesian anywhere; seed join keyed on fp") {
    val p = executedPlan("dd_substr")
    assert(!p.contains("CartesianProduct"), s"dd_substr plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"dd_substr plans a nested-loop join:\n$p")
    // the self-join and the band semi-join both partition on fp
    assert(p.contains("fp"), s"expected fp-keyed operators:\n$p")
  }

  test("dd_substr: no aggregate keyed on (doc_id, pos, fp) — per-doc dedup stays in the array domain") {
    // the naive form paid a corpus-wide dropDuplicates(doc_id, pos, fp)
    // exchange (measured 58.6 s vs 26.8 s at the 100x probe); pin that
    // it never comes back: no HashAggregate groups on all three seed
    // columns together
    val p = executedPlan("dd_substr")
    val aggOnSeedCols = p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("doc_id") &&
        l.contains("pos") && l.contains("fp") && l.contains("keys"))
    assert(!aggOnSeedCols,
      s"per-doc fingerprint dedup regressed to a corpus-wide exchange:\n$p")
  }

  test("dd_substr_scrub: the cut stage adds no joins beyond the span relation + one left join") {
    val p = executedPlan("dd_substr_scrub")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("dd_substr_incr: detection joins carry fingerprints; corpus text only post-match") {
    val p = executedPlan("dd_substr_incr")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the persisted index feeds the seed join
    assert(p.contains("graft_dedup_index"), s"plan must scan the persisted index:\n$p")
    // the index scan reads (doc_id, pos, fph) only — never a text column
    val idxScans = p.linesIterator.filter(l =>
      l.contains("graft_dedup_index") && l.contains("ReadSchema")).toSeq
    assert(idxScans.nonEmpty && idxScans.forall(l => !l.contains("text")),
      s"index scan must not read text:\n${idxScans.mkString("\n")}")
  }

  test("ds_temperature / dq_dp_hist: one aggregate family, rates/noise broadcast, no cartesian data path") {
    for (q <- Seq("ds_temperature", "dq_dp_hist")) {
      val p = executedPlan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      // constant-width side relations (per-lang rates / the bounds row /
      // the 10-bin frame) must broadcast, never shuffle the corpus
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q should broadcast its constant-width side:\n$p")
    }
  }

  test("dq_dp_geo: the same one-aggregate release shape as dq_dp_hist") {
    val p = executedPlan("dq_dp_geo")
    assert(!p.contains("CartesianProduct"), s"dq_dp_geo plans a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"dq_dp_geo should broadcast its constant-width sides:\n$p")
  }

  test("tok_fertility: the vocabulary-sized encode relation broadcasts; corpus text never self-joins") {
    val p = executedPlan("tok_fertility")
    assert(!p.contains("CartesianProduct"), s"tok_fertility plans a cartesian:\n$p")
    // word instances ⋈ per-word encode stats must be a broadcast of the
    // vocabulary-bounded side — a shuffled join here would move the
    // corpus-sized instance relation twice at 100 TB
    assert(p.contains("BroadcastHashJoin"),
      s"tok_fertility should broadcast the encode relation:\n$p")
  }
}
