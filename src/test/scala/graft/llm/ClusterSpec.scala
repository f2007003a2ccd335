package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Connected components (large-star/small-star) — the engine's labelling
  * must match a from-scratch driver-side union-find on both a planted
  * worst case (a long chain, which defeats naive O(diameter) propagation
  * budgets) and a seeded random graph. */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference implementation: path-compressed union-find. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are already the component minima because unions always point
    // the larger root at the smaller one
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("long chain plus separate cliques label to the component minimum") {
    val chain = (0L until 40L).map(i => (i, i + 1)) // diameter 40
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val pair = Seq((500L, 501L))
    val got = labelsOf(chain ++ clique ++ pair)
    assert((0L to 40L).forall(got(_) == 0L))
    assert((100L to 104L).forall(got(_) == 100L))
    assert(got(500L) == 500L && got(501L) == 500L)
    assert(got.size == 48)
  }

  test("seeded random graph matches driver-side union-find exactly") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(labelsOf(pairs) == unionFind(pairs))
  }

  test("empty pair list yields empty labelling") {
    assert(labelsOf(Seq.empty).isEmpty)
  }
}
