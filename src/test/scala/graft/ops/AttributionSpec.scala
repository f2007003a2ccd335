package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** w18_attribution: the channel relation is hash-gated; pinned here is
  * the ACCOUNTING — every model must conserve total purchase value
  * (the property that makes an attribution table trustworthy), and the
  * three models must actually disagree on this corpus (identical
  * columns would make the multi-model output decorative). */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("value conservation under every model; models disagree; channels bounded") {
    val rows = Events.queries("w18_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.io.Sources.table(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 1000000L).cast("long"))).head.getLong(0)
    def s(c: String): Double = rows.map(_.getAs[Double](c)).sum
    val totalV = total / 1000000.0
    // first/last credit each purchase exactly once (channel or -1):
    // totals match the quantized purchase sum to rounding width
    assert(math.abs(s("first_value") - totalV) < 1e-2, s"first-touch leaked value")
    assert(math.abs(s("last_value") - totalV) < 1e-2, s"last-touch leaked value")
    // linear drops at most (touches) micro-units to integer DIV
    assert(s("linear_value") <= totalV + 1e-2)
    assert(totalV - s("linear_value") < 0.01,
      s"linear model lost more than DIV remainders: ${totalV - s("linear_value")}")
    // purchase counts conserve too
    val n = rows.map(_.getAs[Long]("n_first")).sum
    val np = graft.io.Sources.table(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(n == np, s"first-touch counted $n purchases, table has $np")
    assert(rows.map(_.getAs[Long]("n_last")).sum == np)
    // models must disagree somewhere (multi-touch purchases exist)
    assert(rows.exists(r =>
      r.getAs[Double]("first_value") != r.getAs[Double]("last_value")),
      "first == last on every channel: no multi-touch purchase on the corpus")
    rows.foreach { r =>
      val ch = r.getAs[Int]("channel")
      assert(ch == -1 || (ch >= 0 && ch <= 23), s"channel out of domain: $ch")
    }
  }
}
