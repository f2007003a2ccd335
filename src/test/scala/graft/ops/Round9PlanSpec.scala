package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan-shape assertions for the round-9 operators — the scale claims
  * their doc comments make, verified against executed plans (the
  * PlanShapeSpec discipline). */
class Round9PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  /** ADVICE r9: join-strategy assertions must read the AQE FINAL plan —
    * `executedPlan` before execution still holds AQE's provisional
    * sort-merge choices, so the assertion would track size estimates,
    * not the real runtime decision. Collect first, then render. */
  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("ds_doremi: no cartesian; the threshold/resample joins broadcast") {
    val p = plan("ds_doremi")
    assert(!p.contains("CartesianProduct"), s"ds_doremi plans a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the |sources|-row relations should broadcast:\n$p")
  }

  test("tx_dpo_pairs: prompt-grouped pairing, no cartesian") {
    val p = plan("tx_dpo_pairs")
    assert(!p.contains("CartesianProduct"), s"tx_dpo_pairs plans a cartesian:\n$p")
  }

  test("ann_lifecycle: tombstones anti-join broadcast; cells route via broadcast; no cartesian on the data path") {
    val p = plan("ann_lifecycle")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(p.contains("LeftAnti"), s"tombstones must anti-join:\n$p")
  }

  test("tok_unigram_encode: vocab joins broadcast against the word instances") {
    val p = plan("tok_unigram_encode")
    assert(p.contains("BroadcastHashJoin"), s"vocab side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("tok_unigram_train: the E-step is scan-local — the only wide ops are vocab-bounded") {
    // the final vocab relation must not contain a corpus-wide join: the
    // plan's joins are the (vocab x counts) merges only. Executed plan
    // (ADVICE r9): AQE's final broadcast decisions, not estimates.
    val p = executedPlan("tok_unigram_train")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"vocab-bounded relations should broadcast, never sort-merge:\n$p")
  }

  test("gr_scc output carries every node exactly once with min-id scc ids") {
    val rows = SparkEntry.queries("gr_scc")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // scc_id is a member of its own component and is the minimum member
    val byScc = rows.groupBy(_.getAs[Long]("scc_id"))
    byScc.foreach { case (id, members) =>
      val ids = members.map(_.getAs[Long]("doc_id"))
      assert(ids.min == id, s"scc_id $id must be the min member (got ${ids.min})")
      assert(members.forall(_.getAs[Long]("scc_size") == members.length))
    }
  }
}
