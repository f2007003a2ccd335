package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Physical-plan shape assertions — the 100 TB design properties the
  * queries claim (filter pushdown, column pruning, broadcast joins, no
  * cartesian products) verified against the actual executed plans, not
  * just code review. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("f1_eq pushes the predicate into the parquet scan") {
    val p = plan("f1_eq")
    assert(p.contains("PushedFilters") && p.contains("c_mktsegment"),
      s"expected pushed filter on c_mktsegment:\n$p")
  }

  test("f1_eq prunes the scan to the referenced columns only") {
    val p = plan("f1_eq")
    assert(!p.contains("c_nationkey"), "unreferenced column should not be read")
  }

  test("j1 enrich joins the dim side broadcast, not shuffled") {
    val p = plan("j1_enrich_bcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("j3 chains two broadcast joins without shuffling the fact side") {
    val p = plan("j3_chain")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
  }

  test("j4 semi-join plans as a real LeftSemi") {
    assert(plan("j4_semi").contains("LeftSemi"))
  }

  test("aggregations use partial (map-side) aggregation") {
    val p = plan("a11_counts")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected two-phase hash aggregate:\n$p")
  }

  test("no dedup/similarity query plans a cartesian product") {
    for (q <- Seq("dd_jaccard", "dd_minhash", "dd_simhash", "ann_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
    }
  }

  test("knn broadcast probe: candidate side is never shuffled for the join") {
    val p = plan("knn_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side should broadcast:\n$p")
  }

  test("k5 play-proportional relations broadcast via AQE, not a forced hint") {
    // plays/boundaries grow with the input, so their broadcast hints
    // were removed (VERDICT r2 §wrong 5); at test scale AQE must still
    // pick broadcast joins from measured sizes. AQE finalizes the plan
    // on execution, so run first.
    val df = SparkEntry.queries("k5_max_params")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should broadcast the small play-side relations at test scale:\n$p")
  }

  test("j8 range join plans as an equi hash join on week buckets, never a theta BNLJ") {
    // the exploded interval side is tiny (≤6 rows per promo window) so
    // it must broadcast, and the containment predicate must survive
    // only as a residual filter — the BroadcastNestedLoopJoin the naive
    // BETWEEN theta-join would plan means the bucketization regressed
    val p = plan("j8_range")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast equi join on wk:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not fall back to a theta join:\n$p")
  }

  test("j8_range_smj carries the same bucketized equi-key through a sort-merge join") {
    // the big-interval-side regime: no broadcast available, the week
    // bucket must become an SMJ key — never a theta BNLJ
    val p = plan("j8_range_smj")
    assert(p.contains("SortMergeJoin"), s"expected SMJ on wk:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no-broadcast range join must not fall back to a theta join:\n$p")
  }

  test("j9 bloom-pruned join probes a runtime bloom filter at the fact scan") {
    // the no-broadcast session must inject might_contain into the fact
    // side (rows dropped BEFORE the shuffle) and plan the exact join as
    // sort-merge — a BroadcastHashJoin would mean the scoped big-cluster
    // conf leaked away and the gate stopped exercising the 100 TB plan
    val p = plan("j9_bloom_prune")
    assert(p.contains("might_contain"), s"expected a runtime bloom probe:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the scoped session disables broadcast; the exact join must sort-merge:\n$p")
  }

  test("dd_lines_hashed keys its detection shuffle on the 8-byte hash, dd_lines on the string") {
    // the 100 TB claim behind the pair (BASELINE r6: 3.74 → 2.29 MB
    // measured): the hashed variant's frequency aggregate must exchange
    // on line_h, never on the line string
    val hashed = plan("dd_lines_hashed")
    assert(hashed.contains("hashpartitioning(line_h"),
      s"detection exchange must key on xxhash64(line):\n$hashed")
    assert(!hashed.contains("hashpartitioning(line#"),
      s"no exchange in the hashed plan may key on the line string:\n$hashed")
    val stringKeyed = plan("dd_lines")
    assert(stringKeyed.contains("hashpartitioning(line#") ||
      stringKeyed.contains("hashpartitioning(line,"),
      s"string variant keys its detection exchange on the line itself:\n$stringKeyed")
  }

  test("dd_spans detection shuffles 8-byte gram hashes, never gram text") {
    // the k-gram strings must never materialize as a shuffled column:
    // detection exchanges carry (h, doc_id) and the interval walk
    // exchanges doc_id. The toString plan only renders partitioning
    // KEYS on Exchange lines, so the carried columns are checked in
    // the formatted plan: every Exchange node's Input list must be
    // free of text/gram columns
    val p = plan("dd_spans")
    assert(p.contains("hashpartitioning(h#"),
      s"detection exchange must key on the gram hash:\n$p")
    val fmt = SparkEntry.queries("dd_spans")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val lines = fmt.split("\n")
    val exchangeInputs = lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") =>
        // search only within THIS node's detail block (up to the next
        // "(n) Node" header) so a missing Input line fails loudly
        // instead of matching a later node's or passing vacuously
        val block = lines.drop(i + 1)
          .takeWhile(!_.matches("""\(\d+\) \S.*"""))
        val in = block.find(_.startsWith("Input"))
        assert(in.isDefined, s"Exchange at line $i has no Input list:\n$fmt")
        in.get
    }
    assert(exchangeInputs.nonEmpty, s"expected Exchange nodes:\n$fmt")
    exchangeInputs.foreach(in =>
      assert(!in.contains("text#") && !in.contains("gram"),
        s"an exchange carries document text/grams: $in\n$fmt"))
  }

  test("dd_spans membership join broadcasts the dup-gram set below the row budget") {
    // deduplicated-corpus regime (the default threshold, testdata is
    // far under it): the measured dup set is tiny → broadcast join
    val (_, spans) = graft.llm.Dedup.spanFramesAt(spark, sf,
      graft.llm.Dedup.spanDupBroadcastMaxRows)
    val p = spans.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"small dup set must broadcast the membership join:\n$p")
  }

  test("dd_spans membership join shuffles on the 8-byte hash past the row budget") {
    // raw-crawl regime (threshold forced to 0): dup grams ≈ corpus —
    // the membership join must become a shuffled HASH join on h, never
    // a broadcast (which would OOM executors on a real crawl)
    val (_, spans) = graft.llm.Dedup.spanFramesAt(spark, sf, 0L)
    spans.collect() // AQE finalizes on execution
    val p = spans.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"crawl-regime membership join must be a shuffled hash join:\n$p")
  }

  test("ann_ivf_pq cell routing prunes index partitions dynamically (DPP)") {
    // the cells table is written partitionBy(cl); the broadcast routing
    // join on cl must plan a dynamic-partition-pruning filter so a
    // 100 TB index reads nProbe/ivfK of its FILES, not all of them.
    // At sf0.001 the whole index is one file, so the default session's
    // stats-based benefit check collapses the filter to `true` — pin
    // the shape with the benefit heuristic off and broadcast reuse not
    // required (the mechanism, not the toy-scale cost call, is the
    // 100 TB property under test)
    val s = graft.ops.ScopedSession(spark, "dpp-pin",
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false")
    val df = SparkEntry.queries("ann_ivf_pq")(s, sf)
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains(" IN dynamicpruning#"),
      s"cells scan should carry a dynamic partition-pruning filter on cl:\n$p")
  }

  test("whole-stage codegen covers the custom expressions") {
    // the native kernels (vec_dot, sorted_intersect_count) must not
    // break codegen spans around them; AQE only finalizes the plan on
    // execution, so run the query first
    val df = SparkEntry.queries("knn_cosine")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n)" stage markers in the plan string;
    // the vecdot projection must sit inside one
    assert(p.split("\n").exists(l => l.contains("vecdot") && l.contains("*(")),
      s"vecdot should be inside a WholeStageCodegen span:\n$p")
  }

  test("ml_lr_curate serve side is zero-shuffle before the output sort") {
    // scoring = scan-local features standardized/scored by driver
    // literals; the ONLY exchange is the final orderBy's range shuffle
    val p = plan("ml_lr_curate")
    assert("Exchange".r.findAllIn(p).size == 1, s"expected 1 exchange:\n$p")
    assert(!p.contains("Join"), s"serve side must not join:\n$p")
  }

  test("w15_anomaly shares ONE user_id hash exchange across all frame sums") {
    val p = plan("w15_anomaly")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"all three window sums must ride one user_id exchange:\n$p")
    assert("Window".r.findAllIn(p).size >= 1)
  }

  test("ts_entropy runs the fused kernel inside codegen on a pruned scan") {
    val df = SparkEntry.queries("ts_entropy")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.split("\n").exists(l => l.contains("charentropy") && l.contains("*(")),
      s"charentropy should be inside a WholeStageCodegen span:\n$p")
    assert(!p.contains("lang"), "unreferenced columns should not be read")
  }
}
