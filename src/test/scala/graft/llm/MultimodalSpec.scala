package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal plumbing: schema, determinism, fanout bounds, and the
  * metadata-only path staying off the payload column. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("feature extraction preserves ids and emits fixed-width vectors") {
    val media = Multimodal.demoMedia(spark)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == 64)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => f.byte_entropy >= 0.0 && f.byte_entropy <= 4.0))
    // deterministic: a second run yields identical features
    val again = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("frame sampling fans out only video rows, stride-bounded") {
    val media = Multimodal.demoMedia(spark)
    val frames = Multimodal.sampleFrames(spark, media, stride = 4).collect()
    val videoIds = media.collect().filter(_.kind == "video").map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
    assert(frames.forall(_.frame_idx % 4 == 0))
    val perVideo = frames.groupBy(_.media_id).map(_._2.length)
    assert(perVideo.forall(_ <= 8)) // nFrames ≤ 31, stride 4
  }

  test("resize touches only image rows and emits a fixed output size") {
    val media = Multimodal.demoMedia(spark)
    val resized = Multimodal.resizeImages(spark, media).collect()
    val imageIds = media.collect().filter(_.kind == "image").map(_.media_id).toSet
    assert(resized.map(_.media_id).toSet == imageIds)
    assert(resized.forall(r => r.bytes.length == 16 * 12 * 3 && r.out_w == 16 && r.out_h == 12))
    // deterministic: same input → same resized payload
    val again = Multimodal.resizeImages(spark, media).collect()
    assert(resized.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.bytes.sameElements(b.bytes) })
  }

  test("PNG payloads decode back to the exact generated pixels (lossless round-trip)") {
    // the property the mm oracles lean on: source pixels derive from id
    // arithmetic, PNG is lossless, so ImageIO.read must reproduce them
    val m = Multimodal.demoMedia(spark).collect().find(_.kind == "image").get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
    assert(img.getWidth == m.meta.width && img.getHeight == m.meta.height)
    def fnv(x: Int, y: Int, c: Int): Int =
      Multimodal.fnvByte(s"${m.media_id}:$x:$y:$c")
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == fnv(x, y, 0)
        && ((rgb >> 8) & 0xff) == fnv(x, y, 1)
        && (rgb & 0xff) == fnv(x, y, 2), s"pixel ($x,$y) diverged after round-trip")
    }
  }

  test("WAV payloads decode back to the exact generated samples (lossless round-trip)") {
    // the audio analog of the PNG property: samples derive from id
    // arithmetic, PCM is lossless, so the AudioSystem decode must
    // reproduce them — this pins that the decode is REAL (a byte-level
    // fake would see the RIFF header and mangled interleaving)
    val m = Multimodal.demoMedia(spark).collect().find(_.kind == "audio").get
    assert(m.bytes.length == 44 + 2 * m.meta.nFrames) // canonical header
    val decoded = Multimodal.decodeWav(m.bytes)
    val want = Multimodal.audioSamples(m.media_id, m.meta.nFrames)
    assert(decoded.length == want.length)
    assert(decoded.sameElements(want), "decoded samples diverged from the generator")
    assert(decoded.exists(_ < 0) && decoded.exists(_ > 0), "signed range must be exercised")
  }

  test("AVI payloads demux back to the exact generated frames (container round-trip, padded and aligned rows)") {
    // the video analog of the PNG/WAV property: frame pixels derive
    // from id arithmetic, the DIB encoding is lossless, so the demuxer
    // must reproduce them — across widths 15-18 so both padded (45→48,
    // 51→52, 54→56) and aligned (48) row strides are exercised
    val vids = Multimodal.demoMedia(spark).collect().filter(_.kind == "video")
    val widths = vids.map(_.meta.width).toSet
    assert(widths == Set(15, 16, 17, 18), widths)
    vids.take(8).foreach { m =>
      val (w, h, frames) = Multimodal.decodeAvi(m.bytes)
      assert(w == m.meta.width && h == m.meta.height)
      assert(frames.length == m.meta.nFrames)
      for (f <- frames.indices; y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val want = Multimodal.videoPixel(m.media_id, f, x, y, c)
        val got = frames(f)((y * w + x) * 3 + c)
        assert(got == want, s"video ${m.media_id} frame $f ($x,$y,$c): $got != $want")
      }
    }
  }

  test("mm_audio_dedup: lead-in twins pair at overlap 1.0, silence-only overlap is filtered") {
    val spb = Adpcm.samplesPerBlock
    val media = Multimodal.demoMediaAudioDups(spark).collect()
    val byId = media.map(m => m.media_id -> m).toMap
    (0 until 24).filter(_ % 3 == 0).foreach { i =>
      val a = byId(i.toLong)
      val b = byId(2000L + i)
      assert(a.bytes.length != b.bytes.length, s"twin $i must differ as bytes")
      val da = Adpcm.decode(a.bytes)
      val db = Adpcm.decode(b.bytes)
      assert(db.take(spb).forall(_ == 0), s"twin $i lead-in is not silence")
      // the load-bearing codec property (r18): the twin is shifted by
      // exactly one BLOCK, and the encoder's per-block state reset
      // makes the shared content's blocks byte-identical — so the
      // DECODED bodies agree exactly even though ADPCM is lossy
      assert(db.drop(spb).sameElements(da), s"twin $i body diverged from base")
    }
    val rows = Multimodal.queries("mm_audio_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    val pairs = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val want = (0 until 24).filter(_ % 3 == 0).map(i => (i.toLong, 2000L + i)).toSet
    assert(pairs == want,
      s"pair set diverged: extra ${(pairs -- want).take(3)}, missing ${(want -- pairs).take(3)}")
    rows.foreach { r =>
      assert(r.getAs[Double]("overlap") == 1.0, r.toString)
      // n_shared = the base clip's full block-window count
      val fb = (2048 + (r.getAs[Long]("id_a").toInt * 137) % 1024) / spb
      assert(r.getAs[Long]("n_shared") == fb, r.toString)
    }
    // the twin-twin silence window DID collide upstream (the operator's
    // boilerplate token) — the threshold is what filtered it, so the
    // filter is load-bearing, not vacuous
    assert(media.count(m => m.media_id >= 2000) == 8)
  }

  test("audio window features: window fanout, partial tail, and hand-checked zcr/peak") {
    val media = Multimodal.demoMedia(spark)
    val wins = Multimodal.audioWindowFeatures(spark, media).collect()
    val audio = media.collect().filter(_.kind == "audio")
    // every audio row fans out to ceil(nFrames / 256) windows
    val byId = wins.groupBy(_.media_id)
    audio.foreach { m =>
      val ws = byId(m.media_id).sortBy(_.win_idx)
      assert(ws.length == (m.meta.nFrames + 255) / 256)
      assert(ws.map(_.n_samples).sum == m.meta.nFrames)
      ws.init.foreach(w => assert(w.n_samples == 256L))
      // recompute window 0 by hand from the generator samples
      val s = Multimodal.audioSamples(m.media_id, m.meta.nFrames).take(256)
      val peak = s.map(math.abs).max.toLong
      val zcr = s.indices.tail.count(j => s(j - 1) * s(j) < 0).toLong
      val rms = math.sqrt(s.map(v => v.toLong * v).sum.toDouble / s.length)
      val w0 = ws.head
      assert(w0.peak == peak && w0.zcr == zcr && math.abs(w0.rms - rms) < 1e-9,
        s"window 0 mismatch for ${m.media_id}")
    }
  }

  test("bilinear kernel: weights sum exactly (constant image → constant output)") {
    val img = new java.awt.image.BufferedImage(33, 21,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 21; x <- 0 until 33) img.setRGB(x, y, 0x7b7b7b)
    val out = Multimodal.bilinearResize(img, 16, 12)
    assert(out.length == 16 * 12 * 3 && out.forall(b => (b & 0xff) == 0x7b))
  }

  test("mm_dedup collapses the planted duplicate payloads exactly") {
    val out = Multimodal.queries("mm_dedup")(spark, "unused").collect()
      .map(r => (r.getString(0), r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
    assert(out.length == 24) // 24 distinct payload seeds
    assert(out.map(_._3).sum == 64) // every media row accounted for
    // seeds 0-15 appear 3x (ids i, i+24, i+48), 16-23 appear 2x
    assert(out.count(_._3 == 3L) == 16 && out.count(_._3 == 2L) == 8)
    // survivor is the smallest id = the seed itself
    assert(out.map(_._2).toSet == (0L until 24L).toSet)
  }

  test("mm_phash finds every planted perturbed image and nothing else") {
    val pairs = Multimodal.queries("mm_phash")(spark, "unused").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("hamming")))
    // each of the 8 plants pairs with its source; the black 3×3 patch
    // can only disturb the gradient cells at the origin (bits 0 and 7)
    val planted = pairs.filter { case (a, b, _) => b == a + 1000L }
    assert(planted.length == 8, pairs.toSeq)
    planted.foreach { case (_, _, d) => assert(d <= 2, planted.toSeq) }
    // unrelated noise images sit ~31 bits apart — no cross pairs
    assert(pairs.length == 8, pairs.toSeq)
  }

  test("dhash63 never sets the sign bit and distinguishes noise images") {
    val hs = Multimodal.demoMediaPhash(spark).collect()
      .map(m => m.media_id -> Multimodal.dhash63(m)).toMap
    hs.values.foreach(h => assert(h >= 0L, "bit 63 must stay clear"))
    // distinct base images should not collide (63 random-ish bits)
    val base = hs.filter(_._1 < 1000L).values.toSeq
    assert(base.distinct.length == base.length)
  }

  test("metadata-only query prunes the payload column from the scan") {
    val media = Multimodal.demoMedia(spark)
    val plan = Multimodal.metaStats(media).queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes#") || !plan.split("Aggregate")(0).contains("bytes"),
      s"payload column should be pruned before the aggregate:\n$plan")
    val out = Multimodal.metaStats(media).collect()
    assert(out.length == 3) // image, audio, video
  }

  test("mm_vad: segments are maximal runs of above-mean windows") {
    val spark = graft.TestSpark.spark
    val segs = Multimodal.queries("mm_vad")(spark, "").collect()
    assert(segs.nonEmpty)
    // independent recomputation of the per-media mean threshold (r18:
    // over the COMPRESSED corpus the gated query now decodes)
    val wins = Multimodal.audioWindowFeatures(spark,
        Multimodal.demoMediaAdpcm(spark), decode = Adpcm.decode)
      .collect().groupBy(_.media_id)
    val thr = wins.map { case (id, ws) =>
      id -> (ws.map(w => math.floor(w.rms * 10000.0).toLong).sum.toDouble / 10000.0) / ws.length
    }
    segs.groupBy(_.getAs[Long]("media_id")).foreach { case (id, ss) =>
      val t = thr(id)
      val byWin = wins(id).map(w => w.win_idx -> w.rms).toMap
      val sorted = ss.sortBy(_.getAs[Long]("seg_idx"))
      sorted.foreach { s =>
        val (a, b) = (s.getAs[Long]("start_win"), s.getAs[Long]("end_win"))
        assert(a <= b && b - a + 1 == s.getAs[Long]("n_wins"))
        (a to b).foreach(w => assert(byWin(w.toInt) >= t, s"$id win $w below threshold"))
        // maximality: the windows flanking the run are below threshold
        if (byWin.contains(a.toInt - 1)) assert(byWin(a.toInt - 1) < t)
        if (byWin.contains(b.toInt + 1)) assert(byWin(b.toInt + 1) < t)
      }
      // non-overlapping, ordered
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("end_win") < y.getAs[Long]("start_win"))
        case _ =>
      }
    }
  }
}
