package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** st_drift's streaming/batch parity: after the last trigger the
  * cumulative candidate histogram IS the full candidate set, so the
  * final batch's 10 rows must equal dq_drift's output row for row —
  * the st_anomaly discipline (the batch twin gates the stream
  * verbatim). Earlier triggers must show the monitor genuinely
  * updating (n_cur non-decreasing per bin, strictly growing totals). */
class StDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("final trigger equals the batch dq_drift; cumulative counts grow") {
    val st = StreamQueries.queries("st_drift")(spark, sf).collect()
    assert(st.length == 40) // 4 batches x 10 bins
    val last = st.filter(_.getAs[Long]("batch") == 3L)
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"), r.getAs[Long]("psi_micro"))).sortBy(_._1).toSeq
    val batch = graft.ops.Quality.queries("dq_drift")(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"), r.getAs[Long]("psi_micro"))).sortBy(_._1).toSeq
    assert(last == batch, "final streamed trigger must equal the batch twin")
    // monotone accumulation across triggers
    val byBin = st.groupBy(_.getAs[Long]("bin"))
    byBin.values.foreach { rs =>
      val cs = rs.sortBy(_.getAs[Long]("batch")).map(_.getAs[Long]("n_cur")).toSeq
      cs.sliding(2).foreach { case Seq(a, b) => assert(b >= a) }
    }
    val totals = (0L to 3L).map(t =>
      st.filter(_.getAs[Long]("batch") == t).map(_.getAs[Long]("n_cur")).sum)
    totals.sliding(2).foreach { case Seq(a, b) => assert(b > a) }
  }
}
