package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** gr_scc structural invariants on the planted ring+bridge graph, plus
  * an independent in-JVM Tarjan recomputation — a third algorithm next
  * to the engine's iterative doubling and the oracle's recursive
  * closure. */
class SccSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plantedEdges(nodes: Set[Long]): Map[Long, List[Long]] = {
    val out = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    nodes.foreach { v =>
      if (v % 7 != 0) {
        val d = (v - v % 5) + ((v % 5 + 1) % 5)
        if (nodes(d)) out(v) ::= d
      }
      if (v % 5 == 0 && nodes(v + 5)) out(v) ::= (v + 5)
    }
    out.toMap.withDefaultValue(Nil)
  }

  /** Iterative Tarjan (explicit stack — no recursion depth limit). */
  private def tarjan(nodes: Seq[Long], adj: Map[Long, List[Long]]): Map[Long, Long] = {
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // work stack of (node, remaining-neighbors)
      val work = scala.collection.mutable.Stack[(Long, List[Long])]()
      index(root) = counter; low(root) = counter; counter += 1
      stack.push(root); onStack += root
      work.push((root, adj(root)))
      while (work.nonEmpty) {
        val (v, rest) = work.pop()
        rest match {
          case w :: tail =>
            work.push((v, tail))
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack.push(w); onStack += w
              work.push((w, adj(w)))
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          case Nil =>
            if (work.nonEmpty) {
              val (p, _) = work.top
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) {
              var members = List.empty[Long]
              var w = -1L
              while ({ w = stack.pop(); onStack -= w; members ::= w; w != v }) ()
              val id = members.min
              members.foreach(comp(_) = id)
            }
        }
      }
    }
    comp.toMap
  }

  test("gr_scc matches an independent Tarjan and the planted structure") {
    val rows = Graph.queries("gr_scc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("scc_id")).toMap
    val nodes = got.keySet
    val expect = tarjan(nodes.toSeq.sorted, plantedEdges(nodes))
    assert(got == expect, "engine SCC must equal Tarjan's")
    // structure: an SCC never spans two ring groups (bridges are one-way)
    rows.foreach { r =>
      assert(r.getAs[Long]("scc_id") / 5 * 5 == r.getAs[Long]("doc_id") / 5 * 5 ||
        r.getAs[Long]("scc_size") == 1, r.toString)
    }
    val sizes = rows.map(_.getAs[Long]("scc_size")).toSet
    assert(sizes == Set(1L, 5L), s"planted graph has 5-cycles and singletons only: $sizes")
    // a group containing a %7==0 member shatters; others stay whole
    val intact = rows.filter(_.getAs[Long]("scc_size") == 5L)
      .map(_.getAs[Long]("doc_id") / 5).toSet
    assert(intact.nonEmpty)
    intact.foreach { g =>
      assert((g * 5 until g * 5 + 5).forall(_ % 7 != 0), s"group $g has a broken ring")
    }
  }
}
