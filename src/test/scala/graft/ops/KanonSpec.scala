package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dq_kanon structural gates: the k rule is applied consistently, both
  * statuses genuinely occur on the corpus (the audit can fail AND pass
  * groups), and group sizes partition the user population. */
class KanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("k rule consistent, both statuses live, groups partition the users") {
    val rows = Quality.queries("dq_kanon")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_users")
      val want = if (n < 5) "violating" else "ok"
      assert(r.getAs[String]("status") == want)
    }
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses == Set("ok", "violating"), s"one-sided audit: $statuses")
    val users = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
  }
}
