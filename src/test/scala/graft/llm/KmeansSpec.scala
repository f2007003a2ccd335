package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ml_kmeans checked two ways: (1) the full 20-row output on a planted
  * 4-blob corpus must equal an independent driver-side Lloyd
  * implementation (plain Scala loops — the BfsSpec third-algorithm
  * discipline), and (2) on real sf0.001 embeddings the loop must show
  * genuine Lloyd dynamics: complete partition every iteration and a
  * non-increasing total within-cluster sum of squares. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = 64

  /** 4 tight blobs of 10 vectors; blob b sits at b·10⁶ in every
    * dimension with a per-vector ±(vec_id mod 7) unit wobble. vec_id
    * is striped so the hash-shard init (vec_id % 4) starts each
    * centroid at its own blob mean. */
  private def planted: Seq[(Long, Array[Long])] =
    (0L until 40L).map { id =>
      val blob = (id % 4).toInt
      (id, Array.tabulate(D)(d => blob * 1000000L + ((id % 7) - 3) * (d % 5)))
    }

  /** Independent reference: plain-Scala Lloyd with the same init,
    * floor-division mean, (dist, k) argmin tie-break, and div-1000
    * wcss quantization. */
  private def refLloyd(rows: Seq[(Long, Array[Long])], t: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val K = 4
    def mean(members: Seq[Array[Long]]): Array[Long] =
      Array.tabulate(D) { d =>
        val s = members.map(_(d)).sum
        math.floor(s.toDouble / members.size).toLong
      }
    var cents: Map[Int, Array[Long]] =
      (0 until K).map(k => k -> mean(rows.filter(_._1 % K == k).map(_._2))).toMap
    val out = collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    for (it <- 1 to t) {
      def dist(v: Array[Long], c: Array[Long]): Long =
        (0 until D).map(d => (v(d) - c(d)) * (v(d) - c(d))).sum
      val assigned = rows.map { case (id, v) =>
        val k = (0 until K).minBy(k => (dist(v, cents(k)), k))
        (id, v, k, dist(v, cents(k)))
      }
      val newCents = (0 until K).map { k =>
        val m = assigned.filter(_._3 == k).map(_._2)
        k -> (if (m.isEmpty) cents(k) else mean(m))
      }.toMap
      for (k <- 0 until K) {
        val m = assigned.filter(_._3 == k)
        out += ((it.toLong, k.toLong, m.size.toLong,
          m.map(_._4 / 1000).sum, newCents(k).sum))
      }
      cents = newCents
    }
    out.toSeq
  }

  test("planted 4-blob corpus: engine output equals the independent reference row for row") {
    import spark.implicits._
    val df = planted.toDF("vec_id", "eq")
    val got = Kmeans.lloyd(spark, df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val want = refLloyd(planted, 5)
    assert(got == want)
    // blobs recovered exactly: 10 members per cluster every iteration
    assert(got.forall(_._3 == 10L))
    // wobble is real: wcss strictly positive (the gate can fail both ways)
    assert(got.exists(_._4 > 0L))
  }

  test("bit-identical output on any partitioning (the integer-reduce guarantee)") {
    import spark.implicits._
    val rows = planted
    def run(parts: Int) =
      Kmeans.lloyd(spark, rows.toDF("vec_id", "eq").repartition(parts))
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }

  test("sf0.001 embeddings: complete partition and non-increasing total WCSS") {
    val rows = Kmeans.queries("ml_kmeans")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20) // T=5 iterations x K=4 clusters
    val byIter = rows.groupBy(_.getAs[Long]("iter")).toSeq.sortBy(_._1)
    val n = byIter.head._2.map(_.getAs[Long]("n_k")).sum
    assert(n > 0)
    byIter.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_k")).sum == n) // every vector assigned
    }
    val totals = byIter.map(_._2.map(_.getAs[Long]("wcss_q")).sum)
    totals.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
  }
}
