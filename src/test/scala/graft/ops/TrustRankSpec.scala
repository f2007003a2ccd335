package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** gr_trustrank (Gyöngyi et al. 2004): the oracle gate pins the value;
  * this spec pins the SEMANTICS with an independent plain-Scala
  * power-iteration replay (exact Long arithmetic — any divergence in
  * teleport placement, damping, or round count mismatches exactly) and
  * the property the operator exists for: zero trust without a path
  * from the seed set. */
class TrustRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val rankUnit = 1000000000L

  private def fixture(): (Array[Long], Map[Long, Seq[Long]], Set[Long]) = {
    val ids = graft.io.Sources.table(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = ids.length.toLong
    val out = ids.map(u => u -> (1L to 3L).map(j =>
      java.lang.Math.floorMod(u * 31 + j * 17 + 7, n))).toMap
    val seeds = ids.filter(_ % 53 == 0).toSet
    (ids, out, seeds)
  }

  test("engine matches an independent exact-integer power iteration") {
    val (ids, out, seeds) = fixture()
    val nSeeds = seeds.size.toLong
    var t = ids.map(u => u -> (if (seeds(u)) rankUnit / nSeeds else 0L)).toMap
    for (_ <- 1 to 5) {
      val contrib = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (u <- ids; v <- out(u)) contrib(v) += t(u) / 3
      t = ids.map(u => u ->
        ((if (seeds(u)) (15L * (rankUnit / nSeeds)) / 100L else 0L)
          + (85L * contrib(u)) / 100L)).toMap
    }
    val got = Graph.queries("gr_trustrank")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("trust_q"), r.getAs[Boolean]("is_seed"))).toMap
    assert(got.keySet == ids.toSet)
    ids.foreach { u =>
      assert(got(u)._1 == t(u), s"doc $u: engine ${got(u)._1} != replay ${t(u)}")
      assert(got(u)._2 == seeds(u), s"doc $u: is_seed flag")
    }
  }

  test("trust is zero exactly off the 5-hop reach of the seed set") {
    val (ids, out, seeds) = fixture()
    // forward reachability from seeds within 5 propagation rounds
    var reach = seeds
    for (_ <- 1 to 5) reach = reach ++ reach.flatMap(out(_))
    val got = Graph.queries("gr_trustrank")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("trust_q")).toMap
    val positive = got.filter(_._2 > 0L).keySet
    // every positive-trust node is reachable (no trust from nowhere —
    // the anti-spam property); note the converse needn't hold exactly:
    // a reachable node can floor to 0 through repeated integer div
    assert((positive -- reach).isEmpty,
      s"trust without a seed path: ${(positive -- reach).take(5)}")
    // and the seed set itself always keeps its teleport share
    val nSeeds = seeds.size.toLong
    seeds.foreach(u => assert(got(u) >= (15L * (rankUnit / nSeeds)) / 100L,
      s"seed $u lost its teleport floor"))
  }
}
