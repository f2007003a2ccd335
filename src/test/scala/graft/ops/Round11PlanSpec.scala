package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan-shape gates for the round-11 operators: the scale arguments in
  * their doc comments pinned as executed-plan assertions (the
  * Round9PlanSpec discipline — AQE-final plans, collected first where
  * join strategy matters). */
class Round11PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** AQE-final section only — the rendered string appends the
    * provisional "== Initial Plan ==", whose pre-runtime join picks
    * must not trip the negative assertions. */
  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("ts_bm25: queries/df broadcast into postings, top-k plans as WindowGroupLimit, no cartesian") {
    val p = executedPlan("ts_bm25")
    assert(p.contains("BroadcastHashJoin"), s"query set must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-qid top-k should push partial+final WindowGroupLimit:\n$p")
    assert(!p.contains("CartesianProduct"), s"bm25 plans a cartesian:\n$p")
  }

  test("ts_hybrid_rrf: both fusion inputs arrive broadcast-probed; no cartesian on the data path") {
    val p = executedPlan("ts_hybrid_rrf")
    assert(p.contains("BroadcastHashJoin"), s"probes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"rrf plans a cartesian:\n$p")
    // the cosine side is one candidate pass against broadcast probes —
    // the knn_cosine baseline shape (BroadcastNestedLoopJoin is the
    // declared probe cross; anything shuffling candidates on a key
    // would show SortMergeJoin against the embedding scan)
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"candidate side should not shuffle for the probe cross:\n$p")
  }

  test("gr_linkpred: bridge self-join shuffles on the bridge key, never cartesian; anti-join present") {
    val p = executedPlan("gr_linkpred")
    assert(!p.contains("CartesianProduct"), s"linkpred plans a cartesian:\n$p")
    // the only BNLJs allowed are the one-row node-census crosses from
    // the planted edge build (the house crossJoin(broadcast(1-row))
    // convention); the PAIRING joins must all be hash joins
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2,
      s"unexpected BNLJ beyond the census crosses:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"pairing must hash-join on the bridge key:\n$p")
    assert(p.contains("LeftAnti"), s"existing edges must anti-join away:\n$p")
  }

  test("ml_kmeans: one iteration plans as scan + partial/final hash aggregate, no row shuffle beyond the K-row merge") {
    // the query runs T jobs; assert on the LAST iteration's stats
    // aggregate via the loop seam: a single groupBy(k) over the
    // quantized relation must partial-aggregate map-side (HashAggregate
    // x2 around one Exchange of K-row partials)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val eq = (0L until 64L).map(i => (i, Array.fill(64)(i))).toDF("vec_id", "eq")
    val stats = eq.withColumn("k", col("vec_id") % 4)
      .groupBy("k").agg(count(lit(1)).as("n_k"), sum(element_at(col("eq"), 1)).as("s1"))
    stats.collect()
    val p = stats.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("HashAggregate"), s"expected hash aggregate:\n$p")
    assert(p.contains("partial_count"),
      s"the reduce must partial-aggregate map-side:\n$p")
    assert("Exchange".r.findAllIn(p).length == 1,
      s"exactly one exchange (the K-row partial merge) expected:\n$p")
  }
}
