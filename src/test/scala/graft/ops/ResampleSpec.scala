package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** w14_resample invariants beyond the oracle hash: grid contiguity,
  * fill completeness, and flag/value consistency. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val out = Events.queries("w14_resample")(spark, sf).cache()

  test("the hourly grid is contiguous per user with no missing values") {
    val w = Window.partitionBy("user_id").orderBy("hour_s")
    val gaps = out
      .withColumn("prev", lag(col("hour_s"), 1).over(w))
      .filter(col("prev").isNotNull && col("hour_s") - col("prev") =!= 3600L)
    assert(gaps.count() == 0)
    // forward fill from an always-observed first hour: never null
    assert(out.filter(col("value_ffill").isNull).count() == 0)
    assert(out.count() > 0)
  }

  test("filled rows outnumber observations only between events, never at them") {
    val ev = graft.io.Sources.table(spark, sf, "events")
      .select(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_s"))
      .distinct()
    // every observed (user, hour) must be flagged as NOT filled
    val wrong = out.filter(!col("filled"))
      .join(ev, Seq("user_id", "hour_s"), "left_anti")
    assert(wrong.count() == 0)
    val wrong2 = out.filter(col("filled"))
      .join(ev, Seq("user_id", "hour_s"), "left_semi")
    assert(wrong2.count() == 0)
  }
}
