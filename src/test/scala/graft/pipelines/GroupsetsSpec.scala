package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** a18_groupsets: values are hash-gated; pinned here is the SET
  * structure that distinguishes grouping sets from rollup/cube — only
  * the two single-column marginals exist (no pair level, no grand
  * total), and each marginal's counts sum to the table. */
class GroupsetsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exactly the two marginals; each side conserves the row count") {
    val sf = "/root/testdata/sf0.001"
    val rows = Report.queries("a18_groupsets")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fNull = r.isNullAt(r.fieldIndex("l_returnflag"))
      val sNull = r.isNullAt(r.fieldIndex("l_linestatus"))
      assert(fNull != sNull,
        s"row outside the two requested marginals (pair level or grand total): $r")
    }
    val total = graft.io.Sources.table(spark, sf, "lineitem").count()
    val byFlag = rows.filter(!_.isNullAt(0)).map(_.getAs[Long]("n")).sum
    val byStatus = rows.filter(!_.isNullAt(1)).map(_.getAs[Long]("n")).sum
    assert(byFlag == total, s"flag marginal lost rows: $byFlag != $total")
    assert(byStatus == total, s"status marginal lost rows: $byStatus != $total")
  }
}
