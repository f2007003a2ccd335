package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** gr_hits: the twin replays the same CTE algebra, so this spec is the
  * INDEPENDENT check (the TrustRankSpec discipline) — a plain-Scala
  * double-sided power iteration over the planted edges must reproduce
  * every score bit-exactly, and the two columns must genuinely
  * disagree (the reason HITS exists next to PageRank). */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("plain-Scala HITS replay is bit-identical; hubs and authorities disagree") {
    val sf = "/root/testdata/sf0.001"
    val out = Graph.queries("gr_hits")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val n = out.length
    assert(n == 500)
    val unit = 1000000L
    val edges = for (u <- 0 until n; j <- 1 to (1 + u % 3))
      yield (u, ((u.toLong * 31 + j * 17 + 7) % n).toInt)
    var a = Array.fill(n)(unit)
    var h = Array.fill(n)(unit)
    for (_ <- 1 to 4) {
      val hr = new Array[Long](n)
      edges.foreach { case (u, v) => hr(u) += a(v) }
      val sh = hr.sum
      h = hr.map(x => x * unit / sh)
      val ar = new Array[Long](n)
      edges.foreach { case (u, v) => ar(v) += h(u) }
      val sa = ar.sum
      a = ar.map(x => x * unit / sa)
    }
    out.foreach { case (id, hub, auth) =>
      assert(hub == h(id.toInt), s"hub drift at $id: $hub vs ${h(id.toInt)}")
      assert(auth == a(id.toInt), s"auth drift at $id: $auth vs ${a(id.toInt)}")
    }
    // the planted graph's in/out asymmetry must separate the signals:
    // the hub ranking and authority ranking disagree on some node pair
    val byHub = out.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    val byAuth = out.sortBy(r => (-r._3, r._1)).map(_._1).toSeq
    assert(byHub != byAuth, "hub and authority rankings identical: HITS adds nothing")
    // normalization held: each side sums to ~unit (integer DIV loss < n)
    assert(math.abs(out.map(_._2).sum - unit) < n)
    assert(math.abs(out.map(_._3).sum - unit) < n)
  }
}
