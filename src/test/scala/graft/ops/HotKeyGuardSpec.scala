package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Hot-key guards on the per-user collected sequences (VERDICT r8 next
  * §5): w17_ewma and w6_prefix must degrade a power-user key into an
  * explicit overflow row / NULL path instead of materializing an
  * unbounded array — and must leave in-cap users bit-identical to the
  * unguarded fold. Both directions exercised through the impl seams
  * with a tiny cap. */
class HotKeyGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** user 1: 3 events (in cap). user 2: 6 events (over the cap of 4). */
  private lazy val ev = {
    import spark.implicits._
    val rows =
      (1 to 3).map(i => (1L, ts(i.toLong), i.toLong, "view", i.toDouble)) ++
        (1 to 6).map(i => (2L, ts(i.toLong), 100L + i, "view", i.toDouble))
    rows.toDF("user_id", "ts", "event_id", "event_type", "value")
  }

  test("w17_ewma: in-cap user folds exactly; over-cap user becomes an overflow row") {
    val out = Events.w17EwmaImpl(ev, cap = 4L).collect()
    assert(out.length == 2)
    val u1 = out.find(_.getAs[Long]("user_id") == 1L).get
    assert(u1.getAs[Long]("n_events") == 3L)
    // fold: s = 1.0; s = 0.2*2 + 0.8*1 = 1.2; s = 0.2*3 + 0.8*1.2 = 1.56
    assert(u1.getAs[Double]("ewma") == 1.56)
    assert(u1.getAs[Double]("last_value") == 3.0)
    val u2 = out.find(_.getAs[Long]("user_id") == 2L).get
    assert(u2.getAs[Long]("n_events") == 6L, "overflow row still reports its true count")
    assert(u2.isNullAt(u2.fieldIndex("ewma")), "over-cap user must not be folded")
    assert(u2.isNullAt(u2.fieldIndex("last_value")))
  }

  test("w6_prefix: in-cap user keeps full prefix paths; over-cap user's rows carry NULL paths") {
    val out = Events.w6PrefixImpl(ev, cap = 4L).collect()
    assert(out.length == 9, "every input row survives — the guard degrades, never drops")
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L).sortBy(_.getAs[Long]("event_id"))
    assert(u1.map(_.getAs[String]("path")).toSeq ==
      Seq("1.0", "1.0,2.0", "1.0,2.0,3.0"))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 6)
    assert(u2.forall(r => r.isNullAt(r.fieldIndex("path"))),
      "over-cap rows must not materialize prefix arrays")
  }

  test("caps are far above the gated corpus so the guards are invisible to the hash gate") {
    val counts = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val mx = counts.agg(max(col("n"))).head.getLong(0)
    assert(mx < Events.w6MaxSeqLen && mx < Events.w17MaxSeqLen)
  }
}
