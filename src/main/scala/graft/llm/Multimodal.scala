package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextHashKernels
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal column plumbing for the LLM-data-pipeline extension:
  * image/audio/video as opaque `binary` columns with a typed metadata
  * struct, processed per partition.
  *
  * The DECODE step is a clearly-marked STUB (this container ships no
  * image/audio codecs): `decodeStub` derives deterministic fake pixels/
  * samples from the payload bytes. Everything AROUND the stub is the
  * real Spark shape a production pipeline needs and what the tests
  * pin down:
  *  - schema: (media_id, kind, bytes BINARY, meta STRUCT) — parquet-
  *    friendly, splittable, column-prunable (a metadata-only query never
  *    reads the payload bytes);
  *  - partition-wise batch processing via `mapPartitions` (the Scala
  *    analog of arrow-batched UDFs): codec state is initialized once per
  *    partition, not per row;
  *  - frame sampling as a generator (1 video row → n frame rows) with
  *    bounded fanout.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)
  final case class Media(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      byte_entropy: Double, feature: Array[Float])
  final case class FrameSample(media_id: Long, frame_idx: Int, frame_fp: String)

  /** Deterministic demo corpus (payload = seeded pseudo-bytes). */
  def demoMedia(spark: SparkSession, n: Int = 64): Dataset[Media] = {
    import spark.implicits._
    spark.createDataset((0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val len = 256 + (i * 37) % 512
      val bytes = Array.tabulate[Byte](len) { j =>
        (TextHashKernels.rollingHash(UTF8String.fromString(s"$i:$j")) & 0xff).toByte
      }
      val meta = kind match {
        case "image" => MediaMeta(64 + i % 64, 64 + i % 48, 0, 1)
        case "audio" => MediaMeta(0, 0, 16000, 0)
        case _ => MediaMeta(320, 240, 0, 8 + i % 24)
      }
      Media(i.toLong, kind, bytes, meta)
    })
  }

  /** Demo corpus with PLANTED duplicate payloads for the binary-dedup
    * gate: bytes (and length) derive from `media_id % distinct`, so ids
    * sharing a seed are byte-identical copies — seeds 0–15 appear 3×,
    * 16–23 appear 2× at the defaults. The oracle reproduces every byte
    * from the id arithmetic alone (no fixture needed). */
  def demoMediaDups(spark: SparkSession, n: Int = 64, distinct: Int = 24): Dataset[Media] = {
    import spark.implicits._
    spark.createDataset((0 until n).map { i =>
      val seed = i % distinct
      val kind = Seq("image", "audio", "video")(i % 3)
      val len = 256 + (seed * 37) % 512
      val bytes = Array.tabulate[Byte](len) { j =>
        (TextHashKernels.rollingHash(UTF8String.fromString(s"$seed:$j")) & 0xff).toByte
      }
      Media(i.toLong, kind, bytes, MediaMeta(64, 48, 0, 1))
    })
  }

  /** ??? STUB ???  A real implementation decodes the payload with a
    * codec (JPEG/PNG/PCM/H264) and emits pixel/sample tensors. No codec
    * libraries exist in this environment, so features are derived
    * deterministically from the raw bytes — the SHAPE (per-partition
    * init, fixed-width Float vector, entropy scalar) is the contract. */
  private def decodeStub(m: Media): MediaFeatures = {
    val hist = new Array[Int](16)
    m.bytes.foreach(b => hist((b & 0xff) >> 4) += 1)
    val n = m.bytes.length.toDouble
    val entropy = -hist.filter(_ > 0)
      .map(c => (c / n) * math.log(c / n) / math.log(2)).sum
    val feature = Array.tabulate(8)(k =>
      (hist(2 * k) + hist(2 * k + 1)).toFloat / m.bytes.length)
    MediaFeatures(m.media_id, m.kind, m.bytes.length, entropy, feature)
  }

  /** Feature extraction: one pass, partition-wise. The `mapPartitions`
    * boundary is where a real decoder would be constructed once per
    * partition (expensive codec init amortized over the batch). */
  def extractFeatures(spark: SparkSession, media: Dataset[Media]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init would happen here
      it.map(decodeStub)
    }
  }

  /** Frame sampling for video rows: every k-th frame index, fingerprint
    * from the payload (STUB for an actual frame decode — a real one
    * hashes the decoded frame). 1 → n generator with fanout bounded by
    * meta.nFrames / stride. The stub fingerprint is the md5 prefix of
    * the canonical "id:frame:len" string, so the WHOLE sampling pattern
    * (video-only, stride, fanout, fp derivation) has a DuckDB twin. */
  def sampleFrames(spark: SparkSession, media: Dataset[Media], stride: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until m.meta.nFrames by stride).map { f =>
        val hex = md.digest(s"${m.media_id}:$f:${m.bytes.length}"
            .getBytes("UTF-8")).map("%02x".format(_)).mkString
        FrameSample(m.media_id, f, hex.substring(0, 16))
      }
    }
  }

  /** Resized image row: original dims from meta, fixed target dims,
    * resized payload. */
  final case class ResizedMedia(media_id: Long, in_w: Int, in_h: Int,
      out_w: Int, out_h: Int, bytes: Array[Byte])

  /** Image resize to a fixed target: the batch-normalization step a
    * multimodal training pipeline runs before feature extraction.
    * ??? STUB ???  A real implementation decodes, resamples
    * (bilinear/Lanczos), and re-encodes; with no codec in this
    * environment the payload is a deterministic nearest-neighbor
    * subsample of the raw bytes at the target pixel count (w·h·3, fake
    * RGB). The CONTRACT is real and tested: image rows only, one codec
    * init per partition, output size independent of input size. */
  def resizeImages(spark: SparkSession, media: Dataset[Media],
      outW: Int = 64, outH: Int = 48): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      // per-partition "decoder/encoder" init would happen here
      it.map { m =>
        val n = outW * outH * 3
        val out = Array.tabulate[Byte](n)(i =>
          m.bytes((i.toLong * m.bytes.length / n).toInt))
        ResizedMedia(m.media_id, m.meta.width, m.meta.height, outW, outH, out)
      }
    }
  }

  /** Metadata-only projection — must not touch the payload column
    * (column pruning keeps the scan narrow at 100 TB). */
  def metaStats(media: Dataset[Media]): DataFrame =
    media.toDF().select(col("media_id"), col("kind"),
        col("meta.width"), col("meta.height"), col("meta.nFrames"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), max("width").as("max_w"), max("nFrames").as("max_frames"))
      .orderBy("kind")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // feature vector serialized (rounded, comma-joined): raw float
    // arrays are unhashable sort keys in the driver's pandas compare
    "mm_features" -> ((s, _) =>
      extractFeatures(s, demoMedia(s)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          graft.functions.Numeric.dround(col("byte_entropy"), 4).as("byte_entropy"),
          array_join(transform(col("feature"),
            x => graft.functions.Numeric.dround(x.cast("double"), 4).cast("string")), ",")
            .as("feature"))
        .orderBy("media_id")),
    "mm_frame_sample" -> ((s, _) =>
      sampleFrames(s, demoMedia(s)).toDF().orderBy("media_id", "frame_idx")),
    "mm_meta_stats" -> ((s, _) => metaStats(demoMedia(s))),
    // size contract (out bytes = out_w·out_h·3, independent of input
    // size) PLUS a content fingerprint: md5 over the hex of the payload
    // — the oracle regenerates the source bytes (FNV, as mm_features),
    // replays the nearest-neighbor index mapping, and re-derives the
    // same fingerprint, so the resample is verified byte-for-byte
    // exact dedup over BINARY payloads (the cross-modal face of
    // dd_exact): partial aggregation maps each row to its 16-byte
    // content hash + id before the shuffle, so the payloads themselves
    // never move — the 100 TB-relevant property. The hex detour matches
    // mm_resize: DuckDB can only rebuild payloads as hex strings.
    "mm_dedup" -> ((s, _) =>
      demoMediaDups(s).toDF()
        .groupBy(md5(hex(col("bytes")).cast("binary")).as("content_md5"))
        .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_md5")),
    "mm_resize" -> ((s, _) =>
      resizeImages(s, demoMedia(s)).toDF()
        .select(col("media_id"), col("in_w"), col("in_h"),
          col("out_w"), col("out_h"), length(col("bytes")).cast("long").as("n_bytes_out"),
          md5(hex(col("bytes")).cast("binary")).as("content_fp"))
        .orderBy("media_id")))

  /** DuckDB twin over the demo-media metadata fixture Verify dumps to
    * /tmp/graft_fixtures (payload bytes excluded — the metadata-only
    * aggregation is exactly what the query must compute without them).
    *
    * mm_features is fully recomputed: the stub's payload bytes are
    * FNV-1a of "id:j" (demoMedia above), and FNV is SQL-expressible
    * with HUGEINT modular arithmetic (the ts_fingerprint_roll fold) —
    * so the oracle regenerates every byte, rebuilds the nibble
    * histogram, and recomputes entropy (ln/ln2, matching the stub's
    * formula) and the float32 feature quotients from scratch. */
  val oracle: Map[String, String] = Map(
    "mm_features" ->
      s"""WITH m AS (SELECT media_id, kind, n_bytes FROM read_parquet('/tmp/graft_fixtures/demo_media_meta/*.parquet')),
         | b AS (
         |  SELECT m.media_id, t.j,
         |   ${graft.functions.TextHashes.fnvFoldSql("m.media_id || ':' || t.j")} % 256 AS byte
         |  FROM m, LATERAL unnest(generate_series(0, m.n_bytes::INT - 1)) t(j)),
        | hist AS (
        |  SELECT media_id, (byte // 16)::INT AS bin, count(*)::BIGINT AS c
        |  FROM b GROUP BY media_id, (byte // 16)::INT),
        | ent AS (
        |  SELECT media_id,
        |   round(-sum((c::DOUBLE / n_bytes) * ln(c::DOUBLE / n_bytes) / ln(2)), 4) AS byte_entropy
        |  FROM hist JOIN m USING (media_id) GROUP BY media_id),
        | feat AS (
        |  SELECT media_id, string_agg(fv, ',' ORDER BY k) AS feature FROM (
        |    SELECT h.media_id, (h.bin // 2) AS k,
        |     CAST(round((sum(h.c)::FLOAT / max(m.n_bytes)::FLOAT)::DOUBLE, 4) AS VARCHAR) AS fv
        |    FROM hist h JOIN m USING (media_id)
        |    GROUP BY h.media_id, (h.bin // 2))
        |  GROUP BY media_id)
        |SELECT m.media_id, m.kind, m.n_bytes::INT AS n_bytes, e.byte_entropy, f.feature
        |FROM m JOIN ent e USING (media_id) JOIN feat f USING (media_id)
        |ORDER BY m.media_id""".stripMargin,
    "mm_meta_stats" ->
      """SELECT kind, count(*) AS n, max(width) AS max_w, max(nFrames) AS max_frames
        |FROM read_parquet('/tmp/graft_fixtures/demo_media_meta/*.parquet')
        |GROUP BY kind ORDER BY kind""".stripMargin,
    // full content verification: regenerate the source bytes (FNV, as
    // mm_features), replay the nearest-neighbor index map
    // (i·len div 9216), and fingerprint the reconstructed payload —
    // upper-case hex to match Spark's hex()
    "mm_resize" ->
      s"""WITH m AS (SELECT media_id, width, height, n_bytes
         |           FROM read_parquet('/tmp/graft_fixtures/demo_media_meta/*.parquet') WHERE kind='image'),
         | src AS (
         |  SELECT m.media_id, t.j,
         |   (${graft.functions.TextHashes.fnvFoldSql("m.media_id || ':' || t.j")} % 256)::INT AS b
         |  FROM m, LATERAL unnest(generate_series(0, m.n_bytes::INT - 1)) t(j)),
        | outb AS (
        |  SELECT m.media_id, t.i, s.b
        |  FROM m
        |  CROSS JOIN LATERAL unnest(generate_series(0, 9215)) t(i)
        |  JOIN src s ON s.media_id = m.media_id AND s.j = (t.i * m.n_bytes) // 9216),
        | fp AS (SELECT media_id, md5(string_agg(printf('%02X', b), '' ORDER BY i)) AS content_fp
        |        FROM outb GROUP BY media_id)
        |SELECT m.media_id, m.width AS in_w, m.height AS in_h, 64 AS out_w, 48 AS out_h,
        | CAST(9216 AS BIGINT) AS n_bytes_out, fp.content_fp
        |FROM m JOIN fp USING (media_id) ORDER BY media_id""".stripMargin,
    // fully self-contained: payload bytes AND lengths regenerated from
    // media_id arithmetic (seed = id % 24, len = 256 + (seed*37) % 512,
    // bytes = FNV("seed:j")), then grouped — a wrong survivor rule, a
    // fabricated copy count, or a single wrong byte all diverge
    "mm_dedup" ->
      s"""WITH m AS (SELECT i AS media_id, (i % 24) AS seed,
         |             256 + ((i % 24) * 37) % 512 AS n_bytes
         |           FROM (SELECT unnest(generate_series(0, 63)) AS i)),
         | b AS (
         |  SELECT m.media_id, t.j,
         |   (${graft.functions.TextHashes.fnvFoldSql("m.seed || ':' || t.j")} % 256)::INT AS byte
         |  FROM m, LATERAL unnest(generate_series(0, m.n_bytes::INT - 1)) t(j)),
        | fp AS (SELECT media_id, md5(string_agg(printf('%02X', byte), '' ORDER BY j)) AS content_md5
        |        FROM b GROUP BY media_id)
        |SELECT content_md5, min(media_id) AS keep_id, count(*) AS n_copies
        |FROM fp GROUP BY content_md5 ORDER BY content_md5""".stripMargin,
    "mm_frame_sample" ->
      """SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        | substr(md5(media_id || ':' || frame_idx || ':' || n_bytes), 1, 16) AS frame_fp
        |FROM (
        |  SELECT media_id, n_bytes, unnest(generate_series(0, nFrames - 1, 4)) AS frame_idx
        |  FROM read_parquet('/tmp/graft_fixtures/demo_media_meta/*.parquet')
        |  WHERE kind = 'video')
        |ORDER BY media_id, frame_idx""".stripMargin)
}
