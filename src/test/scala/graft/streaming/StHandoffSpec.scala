package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** st_handoff: the hash gate proves batch ∪ stream equals the full
  * hourly table; pinned here is that the seam is REAL — both legs
  * contribute windows (a cut outside the data range would make one leg
  * the whole answer and the gate vacuous) and no (window, type) key is
  * produced by both legs (hour-aligned cut ⇒ disjoint ownership). */
class StHandoffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("both legs own windows; ownership is disjoint at the hour-aligned cut") {
    val sf = "/root/testdata/sf0.001"
    val out = StreamQueries.queries("st_handoff")(spark, sf).collect()
    assert(out.nonEmpty)
    // disjointness: the union must have unique (win_start, event_type)
    // keys — a straddling window would appear once per leg
    val keys = out.map(r => (r.getTimestamp(0), r.getString(1)))
    assert(keys.length == keys.distinct.length,
      "a window was emitted by both legs: the cut is not window-aligned")
    // the seam is inside the data: the corpus midpoint hour splits the
    // window range, so windows exist strictly before AND at/after it
    val ev = graft.io.Sources.table(spark, sf, "events")
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
    val cutUs = ((mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2)
      / 3600000000L) * 3600000000L
    val before = keys.count(_._1.getTime * 1000L < cutUs)
    val after = keys.count(_._1.getTime * 1000L >= cutUs)
    assert(before > 0 && after > 0,
      s"one leg is the whole answer (before=$before after=$after): the seam is vacuous")
  }
}
