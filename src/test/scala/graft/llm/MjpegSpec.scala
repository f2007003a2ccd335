package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** MJPEG/AVI (compressed-codec video): the bitstream claim is
  * CROSS-IMPLEMENTATION — our baseline-JPEG encoder's output is decoded
  * by the JDK's own ImageIO reader (an independent implementation;
  * neither side can echo the other), and the round trip must stay
  * within a pinned per-channel tolerance on every pixel of every
  * frame. Measured on the demo corpus: max |decoded − source| = 5
  * (DCT rounding + the AC quant step of 2 + two color-space
  * round trips); the gate pins 8 = measured + margin — a Huffman
  * table slip, a zigzag transposition, or a DCT coefficient error
  * produces garbage hundreds of counts off, far outside it. */
class MjpegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val tol = 8

  test("encoder bytes are deterministic and every frame is a standalone JPEG") {
    val a = Multimodal.encodeMjpegAvi(7L, 17, 12, 5)
    val b = Multimodal.encodeMjpegAvi(7L, 17, 12, 5)
    assert(java.util.Arrays.equals(a, b), "non-deterministic encode")
    // every '00dc' payload starts with SOI and ends with EOI
    val buf = java.nio.ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var jpegs = 0
    while (buf.position() + 8 <= a.length) {
      val id = {
        val bs = new Array[Byte](4); buf.get(bs); new String(bs, "US-ASCII")
      }
      val size = buf.getInt
      if (id == "LIST") { buf.getInt; () } // descend: skip list type only
      else {
        if (id == "00dc") {
          val p = buf.position()
          assert((a(p) & 0xff) == 0xff && (a(p + 1) & 0xff) == 0xd8, "missing SOI")
          assert((a(p + size - 2) & 0xff) == 0xff && (a(p + size - 1) & 0xff) == 0xd9,
            "missing EOI")
          jpegs += 1
        }
        buf.position(buf.position() + size + (size & 1))
      }
    }
    assert(jpegs == 5)
  }

  test("ImageIO round trip: every pixel within tolerance on every frame") {
    var worst = 0
    for (i <- 0 until 12) {
      val w = 15 + i % 4
      val nFrames = 4 + i % 5
      val bytes = Multimodal.encodeMjpegAvi(i.toLong, w, 12, nFrames)
      val (dw, dh, frames) = Multimodal.decodeMjpegAvi(bytes)
      assert(dw == w && dh == 12 && frames.length == nFrames)
      frames.zipWithIndex.foreach { case (px, f) =>
        var j = 0
        while (j < px.length) {
          val c = j % 3
          val xy = j / 3
          val err = math.abs(px(j) - Multimodal.videoPixel(i.toLong, f, xy % w, xy / w, c))
          worst = math.max(worst, err)
          assert(err <= tol,
            s"media $i frame $f px $j: decoded ${px(j)} vs source, err $err > $tol")
          j += 1
        }
      }
    }
    info(s"worst per-channel error across the corpus: $worst (tolerance $tol)")
  }

  test("mm_frame_sample (MJPEG): stride fanout, fidelity, and the relational fingerprint") {
    val res = Multimodal.queries("mm_frame_sample")(spark, "/root/testdata/sf0.001")
      .collect()
    val expected = (0 until 16).map(i => (8 + i % 9 + 3) / 4).sum
    assert(res.length == expected, s"expected $expected sampled frames, got ${res.length}")
    res.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 4 == 0, r.toString)
      assert(r.getAs[Long]("max_err") <= tol,
        s"sampled frame fidelity breached: $r")
      assert(r.getAs[Long]("n_px") > 0)
    }
    // the relational fingerprint (array_sort + lpad(hex) + md5) must
    // equal the kernel-side convention: md5 over the uppercase hex of
    // the decoded RGB values in row-major (y, x, c) order
    val m = Multimodal.demoMediaMjpegLong(spark).collect().head
    val (_, _, frames) = Multimodal.decodeMjpegAvi(m.bytes)
    val hexStr = frames(0).map(v => f"$v%02X").mkString
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(hexStr.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 16)
    val got = res.find(r => r.getAs[Long]("media_id") == m.media_id
      && r.getAs[Int]("frame_idx") == 0).get.getAs[String]("frame_fp")
    assert(got == want, s"relational fingerprint $got != kernel convention $want")
  }

  test("mm_video_dedup: container twins differ as bytes, decode identically, group once") {
    val media = Multimodal.demoMediaVideoDups(spark).collect()
    val byId = media.map(m => m.media_id -> m).toMap
    (0 until 12).filter(_ % 3 == 0).foreach { i =>
      val a = byId(i.toLong)
      val b = byId(1000L + i)
      assert(!java.util.Arrays.equals(a.bytes, b.bytes),
        s"twin $i is byte-identical — the container re-encode is vacuous")
      val (wa, ha, fa) = Multimodal.decodeMjpegAvi(a.bytes)
      val (wb, hb, fb) = Multimodal.decodeMjpegAvi(b.bytes)
      assert(wa == wb && ha == hb && fa.length == fb.length)
      fa.zip(fb).foreach { case (x, y) =>
        assert(x.sameElements(y), s"twin $i decodes differently from its base")
      }
    }
    val rows = Multimodal.queries("mm_video_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 12) // every group keeps its base id
    rows.foreach { r =>
      val keep = r.getAs[Long]("keep_id")
      val want = if (keep % 3 == 0) 2L else 1L
      assert(r.getAs[Long]("n_copies") == want, r.toString)
      assert(r.getAs[Long]("n_distinct_payloads") == want, r.toString)
    }
  }

  test("the gated query reports the same fidelity: max_err <= tolerance") {
    val res = Multimodal.queries("mm_mjpeg_frames")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(res.nonEmpty)
    val frames = (0 until 12).map(i => 4 + i % 5).sum
    assert(res.length == frames, s"expected $frames frame rows, got ${res.length}")
    res.foreach { r =>
      assert(r.getAs[Long]("max_err") <= tol,
        s"media ${r.getAs[Long]("media_id")} frame ${r.getAs[Int]("frame_idx")}: " +
          s"max_err ${r.getAs[Long]("max_err")} > $tol")
      assert(r.getAs[Long]("n_px") > 0)
    }
  }
}
