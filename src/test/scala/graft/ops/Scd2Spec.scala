package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** w12_scd2 structural invariants beyond the oracle hash: interval
  * chaining, single current version, and true CDC collapse (no two
  * consecutive versions share a value). */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val dim = Events.queries("w12_scd2")(spark, sf).cache()

  test("versions are contiguous from 1 and exactly one is current per user") {
    val w = Window.partitionBy("user_id").orderBy("version")
    val bad = dim
      .withColumn("expected", row_number().over(w).cast("long"))
      .filter(col("version") =!= col("expected"))
    assert(bad.count() == 0)
    val currents = dim.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_cur"))
      .filter(col("n_cur") =!= 1L)
    assert(currents.count() == 0)
  }

  test("intervals chain: valid_to equals the next version's valid_from") {
    val w = Window.partitionBy("user_id").orderBy("version")
    val chained = dim
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull)
    assert(chained.filter(col("valid_to_us") =!= col("next_from")).count() == 0)
    // open current interval carries the sentinel
    assert(dim.filter(col("is_current") && col("valid_to_us") =!= -1L).count() == 0)
  }

  test("CDC collapse: consecutive versions never repeat the value") {
    val w = Window.partitionBy("user_id").orderBy("version")
    val repeats = dim
      .withColumn("prev_val", lag(col("event_type"), 1).over(w))
      .filter(col("prev_val").isNotNull && col("prev_val") === col("event_type"))
    assert(repeats.count() == 0)
  }

  test("both window passes share one user_id exchange") {
    // a static plan for the structural pin: AQE re-instantiates nodes
    // with fresh plan ids at stage boundaries, which defeats counting
    val s = ScopedSession(spark, "scd2-plan-pin",
      "spark.sql.adaptive.enabled" -> "false")
    // sf0.01, not the suite's sf0.001: the cached `dim` relation would
    // otherwise substitute an InMemoryTableScan whose printed plan
    // embeds the original tree again and double-counts the exchange
    val df = Events.queries("w12_scd2")(s, "/root/testdata/sf0.01")
    // the lag pass and the version/lead pass partition identically, so
    // Spark must plan exactly one hash exchange on user_id (plus the
    // presentation sort's range exchange)
    val plan = df.queryExecution.executedPlan.toString
    val hashExchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"$hashExchanges hash exchanges:\n$plan")
  }
}
