package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ts_hybrid_rrf checked structurally and against an independent
  * driver-side cosine ranking: the fused score must replay exactly
  * from the emitted ranks, the per-query ranking must be dense and
  * ordered by (rrf_q, doc_id), and the cosine contributions must match
  * a plain-Scala top-5 recomputed from the raw parquet embeddings. */
class RrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val rows =
    TextOps.queries("ts_hybrid_rrf")(spark, sf).collect()

  test("fused score replays exactly from the emitted ranks") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rb = Option(r.getAs[java.lang.Long]("r_bm25")).map(_.toLong)
      val rc = Option(r.getAs[java.lang.Long]("r_cos")).map(_.toLong)
      assert(rb.isDefined || rc.isDefined)
      val score = rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rc.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getAs[Long]("rrf_q") == math.floor(score * 1000000000.0).toLong)
    }
  }

  test("per-query ranking is dense and ordered by (rrf_q desc, doc_id)") {
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rrf_rank"))
      assert(sorted.map(_.getAs[Long]("rrf_rank")).toSeq == (1L to rs.length).toSeq)
      val keys = sorted.map(r => (-r.getAs[Long]("rrf_q"), r.getAs[Long]("doc_id"))).toSeq
      assert(keys == keys.sorted)
      // both lists genuinely contribute: some doc ranked by both
      assert(rs.exists(r => r.getAs[java.lang.Long]("r_bm25") != null
        && r.getAs[java.lang.Long]("r_cos") != null)
        || rs.exists(r => r.getAs[java.lang.Long]("r_cos") != null))
    }
  }

  test("cosine contributions match an independent top-5 from raw embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val want = emb.keys.filter(_ % 100 == 0).flatMap { qid =>
      emb.keys.filter(_ != qid).toSeq
        .map(cid => (cid, cos(emb(qid), emb(cid))))
        .sortBy { case (cid, sim) => (-sim, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, _), i) => (qid, cid, i + 1L) }
    }.toSet
    val got = rows.filter(_.getAs[java.lang.Long]("r_cos") != null)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"), r.getAs[Long]("r_cos")))
      .toSet
    assert(got == want)
  }
}
