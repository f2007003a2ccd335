package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Planted-structure invariants for mm_video_scenes and tiering
  * invariants for ann_mrl, beyond the oracle hashes. */
class SceneMrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("mm_video_scenes: cuts land exactly on planted boundaries, scene_id = f div len") {
    val rows = Multimodal.queries("mm_video_scenes")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val f = r.getAs[Int]("frame_idx")
      val len = 3 + (id % 3).toInt
      val boundary = f > 0 && f % len == 0
      assert(r.getAs[Boolean]("is_cut") == boundary, r.toString)
      assert(r.getAs[Long]("scene_id") == f / len, r.toString)
      assert(r.getAs[Boolean]("sum_zero") == !boundary,
        s"within-scene MJPEG frames must decode bit-identically (and " +
          s"boundaries must never sum to 0): $r")
    }
    // every planted video appears with its full frame fanout
    val byId = rows.groupBy(_.getAs[Long]("media_id"))
    assert(byId.size == 24)
    byId.foreach { case (id, rs) => assert(rs.length == 8 + (id % 17).toInt) }
  }

  test("decoded MJPEG sums: exactly 0 inside scenes, near source at boundaries") {
    // the fidelity pin behind the sum_zero/is_cut gate: within-scene
    // decoded pairs are bit-identical (byte-identical JPEG chunks);
    // boundary DECODED sums stay within the ≤8-per-channel JPEG error
    // of the exact SOURCE sums, and both sit far above the 30·npx cut
    // threshold
    val raw = Multimodal.sceneCuts(spark, Multimodal.demoMediaScenes(spark))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val len = 3 + (r.media_id % 3).toInt
      val w = 15 + (r.media_id % 4).toInt
      val npx = w * 12 * 3
      val boundary = r.frame_idx > 0 && r.frame_idx % len == 0
      if (!boundary) assert(r.sum_abs == 0L, r.toString)
      else {
        // exact source sum of the boundary pair from the generator
        val anc = r.frame_idx
        val panc = (r.frame_idx - 1) - (r.frame_idx - 1) % len
        var src = 0L
        for (y <- 0 until 12; x <- 0 until w; c <- 0 until 3)
          src += math.abs(Multimodal.videoPixel(r.media_id, anc, x, y, c)
            - Multimodal.videoPixel(r.media_id, panc, x, y, c)).toLong
        assert(math.abs(r.sum_abs - src) <= 16L * npx,
          s"decoded boundary sum ${r.sum_abs} drifted past the JPEG " +
            s"tolerance from source $src: $r")
        assert(r.sum_abs > 30L * npx && src > 30L * npx,
          s"boundary sum under the cut threshold: $r (src $src)")
      }
    }
  }

  test("ann_mrl: both tiers replay in-JVM from the candidate fixture") {
    def l(r: org.apache.spark.sql.Row, c: String): Long = r.getAs[Number](c).longValue()
    val mrl = Similarity.queries("ann_mrl")(spark, sf).collect()
    assert(mrl.nonEmpty)
    val perQ = mrl.groupBy(r => l(r, "qid"))
    assert(perQ.values.forall(_.length == 3), "3 neighbors per probe")
    // independent tier replay: plain Scala over the dumped candidates
    // and raw embeddings — a wrong slice bound, a tier mix-up, or a
    // rerank that ignored the shortlist all diverge
    val emb = graft.io.Sources.table(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) ve").collect()
      .map(r => l(r, "vec_id") -> r.getSeq[Double](1).toArray).toMap
    val cands = spark.read.parquet("/tmp/graft_fixtures/annmrl_cands").collect()
      .map(r => (l(r, "qid"), l(r, "cid")))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = cands.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      val q = emb(qid)
      val short = cs.map { case (_, cid) =>
        (cid, cos(q.take(16), emb(cid).take(16)))
      }.sortBy { case (cid, s) => (-s, cid) }.take(10)
      short.map { case (cid, _) => (cid, cos(q, emb(cid))) }
        .sortBy { case (cid, s) => (-s, cid) }.take(3)
        .zipWithIndex.map { case ((cid, s), i) =>
          (qid, i + 1L, cid, math.rint(s * 10000) / 10000)
        }
    }.toSet
    val got = mrl.map(r =>
      (l(r, "qid"), l(r, "rk"), l(r, "cid"), r.getAs[Double]("sim"))).toSet
    assert(got == expect, s"diff: ${(got diff expect).take(3)} / ${(expect diff got).take(3)}")
  }
}
