package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** gr_linkpred checked two ways: a planted hub-and-bridges graph with
  * hand-computed expected rows (cap drops the hub as a bridge, the
  * anti-join drops the existing edge, cn≥2 drops single-bridge pairs —
  * every rule exercised in BOTH directions), and the real sf0.001
  * graph against an independent plain-Scala set recomputation (the
  * BfsSpec third-algorithm discipline). */
class LinkpredSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** hub 0 ↔ leaves 1..40 (deg 40 > cap); bridges 60,61 ↔ {1,2,3};
    * existing edge 2↔3. */
  private def starAdj = {
    import spark.implicits._
    val edges = (1L to 40L).map(l => (0L, l)) ++
      Seq((60L, 1L), (60L, 2L), (60L, 3L), (61L, 1L), (61L, 2L), (61L, 3L), (2L, 3L))
    (edges ++ edges.map(_.swap)).distinct.toDF("node", "nbr")
  }

  test("planted star: cap, anti-join, and support filter all bite both ways") {
    val got = Graph.linkpredCore(starAdj)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val want = Set(
      (0L, 60L, 3L, 833333L, 750L),   // via capped bridges {1,2,3}
      (0L, 61L, 3L, 833333L, 750L),
      (60L, 61L, 3L, 833333L, 10000L),
      (1L, 2L, 2L, 666666L, 4000L),   // via {60,61}; hub NOT a bridge
      (1L, 3L, 2L, 666666L, 4000L))
    assert(got == want)
    // (2,3) shares {60,61} but IS an edge — anti-joined away (checked
    // by `want` above); with the cap lifted the hub becomes a bridge
    // and (1,2) gains it: cn 3, ra += 1e6 div 40
    val uncapped = Graph.linkpredCore(starAdj, cap = 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(t => t._1 == 1L && t._2 == 2L)
    assert(uncapped.toSeq == Seq((1L, 2L, 3L, 691666L)))
  }

  test("sf0.001 graph matches an independent set-based recomputation") {
    val rows = Graph.queries("gr_linkpred")(spark, "/root/testdata/sf0.001").collect()
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    // independent replant + recompute with plain Scala sets
    val nbrs = collection.mutable.Map[Long, collection.mutable.Set[Long]]()
    for (u <- 0L until n; j <- 1L to 3L) {
      val v = (31L * u + 17L * j + 7L) % n
      if (u != v) {
        nbrs.getOrElseUpdate(u, collection.mutable.Set()) += v
        nbrs.getOrElseUpdate(v, collection.mutable.Set()) += u
      }
    }
    val deg = nbrs.map { case (k, s) => k -> s.size.toLong }.toMap
    val pairs = collection.mutable.Map[(Long, Long), (Long, Long)]()
    for ((w, members) <- nbrs if deg(w) <= 32L; a <- members; b <- members if a < b) {
      val (cn, ra) = pairs.getOrElse((a, b), (0L, 0L))
      pairs((a, b)) = (cn + 1, ra + 1000000L / deg(w))
    }
    val want = pairs.collect {
      case ((a, b), (cn, ra)) if cn >= 2 && !nbrs(a).contains(b) =>
        (a, b, cn, ra, (10000L * cn) / (deg(a) + deg(b) - cn))
    }.toSet
    val got = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty) // the planted graph genuinely produces predictions
  }
}
