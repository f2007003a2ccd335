package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** a13_pivot / a14_rollup / ts_ngram_lm: single-pass plan shapes and
  * the cross-level consistency invariants the oracle's value hash can't
  * express directly. */
class PivotRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("a13_pivot: explicit values keep it to ONE scan and the contract columns") {
    val df = Report.queries("a13_pivot")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("user_id", "click", "view", "purchase", "signup", "error"))
    val p = df.queryExecution.executedPlan.toString
    // without explicit pivot values Spark prepends a distinct-collect
    // pass over event_type — a second scan of the input
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"pivot must not add a schema-discovery scan:\n$p")
  }

  test("a14_rollup: subtotals and grand total are consistent across levels") {
    val rows = Report.queries("a14_rollup")(spark, sf).collect()
    def n(r: org.apache.spark.sql.Row) = r.getAs[Long]("n")
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val flagSub = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1)
    assert(n(grand.head) == leaves.map(n).sum)
    for (f <- flagSub) {
      val flag = f.getString(0)
      assert(n(f) == leaves.filter(_.getString(0) == flag).map(n).sum,
        s"subtotal mismatch for flag $flag")
      assert(math.abs(f.getAs[Double]("sum_qty") -
        leaves.filter(_.getString(0) == flag).map(_.getAs[Double]("sum_qty")).sum) < 1e-9)
    }
  }

  test("a17_cube: full lattice consistency + per-status marginal rollup lacks") {
    val rows = Report.queries("a17_cube")(spark, sf).collect()
    def n(r: org.apache.spark.sql.Row) = r.getAs[Long]("n")
    def gid(r: org.apache.spark.sql.Row) = r.getAs[Long]("gid")
    val leaves = rows.filter(gid(_) == 0L)
    val byFlag = rows.filter(gid(_) == 1L)   // l_linestatus rolled up
    val byStatus = rows.filter(gid(_) == 2L) // l_returnflag rolled up
    val grand = rows.filter(gid(_) == 3L)
    assert(grand.length == 1 && n(grand.head) == leaves.map(n).sum)
    // the marginal rollup can't produce: per-status totals
    for (st <- byStatus) {
      val s = st.getString(1)
      assert(n(st) == leaves.filter(_.getString(1) == s).map(n).sum, s"status $s")
    }
    assert(byFlag.map(n).sum == leaves.map(n).sum)
  }

  test("a17_cube: grouping_id separates rolled-up rows from genuine NULL data") {
    // the NULL-semantics trap of grouping sets (memory note): a NULL in
    // the DATA and a NULL meaning "rolled up" are different rows; only
    // gid tells them apart, in Spark and DuckDB with the same bitmask
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 1.0), (null: String, 2.0), (null: String, 3.0))
      .toDF("k", "v")
    val out = df.cube("k").agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), sum("v").as("sv")).collect()
    val nullData = out.filter(r => r.isNullAt(0) && r.getAs[Long]("gid") == 0L)
    val rolledUp = out.filter(r => r.isNullAt(0) && r.getAs[Long]("gid") == 1L)
    assert(nullData.length == 1 && nullData.head.getAs[Long]("n") == 2L
      && nullData.head.getAs[Double]("sv") == 5.0,
      s"NULL-keyed data rows must aggregate as their own group: ${out.toSeq}")
    assert(rolledUp.length == 1 && rolledUp.head.getAs[Long]("n") == 3L,
      s"the rolled-up row must cover ALL rows: ${out.toSeq}")
  }

  test("a15_equidepth: ten buckets of near-equal depth, no global sort in the plan") {
    val df = Report.queries("a15_equidepth")(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 10))
    val total = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      // equi-depth up to ties at the cut points
      assert(math.abs(n - total / 10.0) < total * 0.02, r.toString)
    }
    // bucket ranges tile: each bucket's max <= next bucket's min
    val sorted = rows.sortBy(_.getInt(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_v") <= b.getAs[Double]("min_v") + 1e-9)
    }
    // the ntile form would range-sort the full data through a
    // GLOBAL-order Window; the r19 selection shape's only window is
    // the per-BIN rank inside the ≤18 refine bins — every Window in
    // the plan must carry a bin partition spec (a global window's
    // spec is empty: windowspecdefinition(v ASC ...))
    val p = df.queryExecution.executedPlan.toString
    val windows = p.split("\n").filter(_.contains("windowspecdefinition"))
    assert(windows.forall(_.contains("windowspecdefinition(bin#")),
      s"equi-depth must not use a global-order window:\n$p")
    val preAgg = p.substring(p.length - p.split("HashAggregate").last.length)
    assert(!preAgg.contains("rangepartitioning"),
      s"no range exchange below the aggregate:\n$p")
  }

  test("ts_ngram_lm: conditionals are well-formed and context totals dominate") {
    // sf0.01: the ≥30 prune is non-vacuous there (sf0.001 counts max ~5)
    val rows = graft.llm.TextOps.queries("ts_ngram_lm")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n12 = r.getAs[Long]("n12"); val n1 = r.getAs[Long]("n1")
      val p = r.getAs[Double]("p_cond")
      assert(n12 >= 30 && n12 <= n1, r.toString)
      assert(p > 0.0 && p <= 1.0, r.toString)
    }
    // p(w2|w1) over the SURVIVING bigrams of one w1 must not exceed 1
    rows.groupBy(_.getString(0)).foreach { case (w1, g) =>
      assert(g.map(_.getAs[Double]("p_cond")).sum <= 1.0 + 1e-6, s"w1=$w1")
    }
  }
}
