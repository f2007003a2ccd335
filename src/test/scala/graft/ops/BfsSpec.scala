package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** gr_bfs checked by a THIRD algorithm (the SccSpec discipline): an
  * in-JVM queue BFS over the independently re-planted graph must
  * reproduce the engine's hop levels exactly, including the
  * unreachable set. */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("gr_bfs matches an independent queue BFS and exposes genuine unreachables") {
    val rows = Graph.queries("gr_bfs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lvl")).toMap
    val n = rows.length.toLong
    // replant: u -> (31u + 17j + 7) mod n for j in 1..3, minus in-edges
    // of dst % 13 == 5
    val adj = got.keySet.toSeq.map { u =>
      u -> (1L to 3L).map(j => (31L * u + 17L * j + 7L) % n)
        .filter(_ % 13L != 5L).toList
    }.toMap
    val dist = scala.collection.mutable.Map[Long, Long]()
    val queue = scala.collection.mutable.Queue[Long]()
    got.keySet.filter(_ % 101L == 0L).toSeq.sorted.foreach { s =>
      dist(s) = 0L; queue.enqueue(s)
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      adj.getOrElse(u, Nil).foreach { v =>
        if (!dist.contains(v)) { dist(v) = dist(u) + 1L; queue.enqueue(v) }
      }
    }
    val expect = got.keySet.map(v => v -> dist.getOrElse(v, -1L)).toMap
    assert(got == expect, "engine BFS levels must equal the queue BFS")
    // both branches genuinely exercised
    assert(rows.exists(!_.getAs[Boolean]("reachable")))
    assert(rows.count(_.getAs[Boolean]("reachable")) > rows.length / 2)
    // every unreachable is explained: in-degree zero and not a seed
    rows.filter(!_.getAs[Boolean]("reachable")).foreach { r =>
      val v = r.getAs[Long]("doc_id")
      assert(v % 13L == 5L && v % 101L != 0L,
        s"$v is unreachable but has in-edges or is a seed")
      assert(r.getAs[Long]("lvl") == -1L)
    }
  }
}
