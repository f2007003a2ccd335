package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ts_pii / ts_tfidf structural properties (byte-exactness of both is
  * gated by their DuckDB oracles; these tests pin the invariants that
  * survive corpus changes). */
class PiiTfidfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ts_pii finds every planted email/ip/phone and scrubs deterministically") {
    val rows = TextOps.queries("ts_pii")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, s"email not found for doc ${r.getLong(0)}")
      assert(r.getLong(2) >= 1, s"ip not found for doc ${r.getLong(0)}")
      assert(r.getLong(3) >= 1, s"phone not found for doc ${r.getLong(0)}")
      assert(r.getString(4).length == 32)
    }
    val again = TextOps.queries("ts_pii")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ts_tfidf emits a full descending top-5 per language") {
    val rows = TextOps.queries("ts_tfidf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val perLang = rows.groupBy(_._1)
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 5), s"ranks for $lang")
      val scores = rs.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not non-increasing for $lang: ${scores.mkString(",")}")
    }
  }
}
