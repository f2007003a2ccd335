package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** pr_pagerank invariants the oracle hash gate cannot see: mass
  * conservation under integer truncation, partition-count independence
  * of the integer formulation, and the planted graph's shape. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pagerank covers every node with positive rank") {
    val df = Graph.queries("pr_pagerank")(spark, sf).cache()
    val n = graft.io.Sources.table(spark, sf, "documents").count()
    assert(df.count() == n)
    assert(df.filter(col("rank_q") <= 0).count() == 0)
    df.unpersist()
  }

  test("pagerank mass is conserved up to integer-truncation loss") {
    val df = Graph.queries("pr_pagerank")(spark, sf)
    val total = df.agg(sum("rank_q")).head.getLong(0)
    // each round loses < ~200 nano-units per node to the three integer
    // divisions; 5 rounds over N nodes bounds the leak well under 1%
    val unit = 1000000000L
    assert(total <= unit, s"mass grew: $total")
    assert(total >= unit * 95 / 100, s"mass leaked: $total")
  }

  test("triangle counts: every triangle contributes exactly 3 node units") {
    val df = Graph.queries("gr_triangles")(spark, sf).cache()
    val n = graft.io.Sources.table(spark, sf, "documents").count()
    assert(df.count() == n) // all nodes present, zeros included
    val total = df.agg(sum("n_tri")).head.getLong(0)
    assert(total > 0, "planted graph should close some triangles")
    assert(total % 3 == 0, s"sum $total must be 3x the triangle count")
    assert(df.filter(col("n_tri") < 0).count() == 0)
    df.unpersist()
  }

  test("label propagation coarsens: fewer communities than nodes, stable under repartition") {
    val out = Graph.queries("gr_lpa")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = out.length
    val communities = out.map(_._2).distinct.length
    // three rounds over a degree-~6 graph must merge labels aggressively
    assert(communities < n / 2, s"$communities communities over $n nodes")
    assert(communities > 0)
    // every label is a real node id (labels only ever copy ids)
    val ids = out.map(_._1).toSet
    assert(out.forall(kv => ids.contains(kv._2)))
    val scoped = ScopedSession(spark, "graphspec-lpa-p3",
      "spark.sql.shuffle.partitions" -> "3")
    val again = Graph.queries("gr_lpa")(scoped, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(again.toSeq == out.toSeq)
  }

  test("integer ranks are identical under a different partition count") {
    val a = Graph.queries("pr_pagerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scoped = ScopedSession(spark, "graphspec-p3",
      "spark.sql.shuffle.partitions" -> "3")
    val b = Graph.queries("pr_pagerank")(scoped, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("gr_kcore: the surviving core IS a k-core and peels are forced") {
    val rows = Graph.queries("gr_kcore")(spark, sf).collect()
    val core = rows.filter(_.getAs[Boolean]("in_core")).map(_.getAs[Long]("doc_id")).toSet
    assert(core.nonEmpty && core.size < rows.length) // both classes live
    // rebuild the planted undirected graph in-test (independent code)
    val n = rows.length
    val und = (for {
      u <- 0L until n.toLong
      j <- 1L to (1 + u % 5)
      v = (u * u + 17 * j + 7) % n if v != u
    } yield (math.min(u, v), math.max(u, v))).toSet
    // every core node keeps >= k neighbors INSIDE the core — the
    // defining k-core property, checked against the engine's verdict
    val coreDeg = core.map(u => u ->
      und.count { case (a, b) => (a == u && core(b)) || (b == u && core(a)) }).toMap
    coreDeg.foreach { case (u, dg) => assert(dg >= 4, s"node $u core-degree $dg") }
    // a node with raw degree < k can only peel in round 1
    rows.filter(r => r.getAs[Long]("deg0") < 4)
      .foreach(r => assert(r.getAs[Long]("peel_round") == 1L, r.toString))
    // peel rounds bounded by the fixed round count
    assert(rows.map(_.getAs[Long]("peel_round")).max <= 4L)
  }
}
