package graft.llm

/** IMA (DVI4) ADPCM in a RIFF/WAVE container — the audio family's
  * compressed-codec leg (VERDICT r17 next §3: video decodes through a
  * real compressed codec, MJPEG/JFIF; audio decoded only uncompressed
  * PCM). Format per the published specifications: WAVE format tag
  * 0x0011, the IMA 89-entry step-size table and 4-bit index-adjust
  * table (IMA Digital Audio Compatibility spec; the same tables every
  * public decoder ships), and the Microsoft WAVE block layout for mono
  * — a 4-byte block header (int16 LE predictor, uint8 step index,
  * reserved byte) followed by two 4-bit samples per byte, LOW nibble
  * first — with the `fact` chunk carrying the true sample count, so
  * any standards-following reader can decode these payloads.
  *
  * The ENCODER resets state at every block boundary (predictor = the
  * block's first sample, step index 0). This is standard-compliant —
  * the block header explicitly transmits both values, which is the
  * whole point of the header (it makes blocks independently seekable)
  * — and it makes block encoding a PURE FUNCTION of the block's
  * samples: encode(a ++ b) = encode(a) ++ encode(b) at block-aligned
  * splits, so decode is blockwise deterministic too. The lead-in
  * dedup plant (mm_audio_dedup) rides exactly that property: a twin
  * shifted by one whole block carries byte-identical blocks for the
  * shared content, so its decoded block windows equal the original's
  * exactly even though the codec is lossy.
  *
  * Implementation re-derived from the published tables and layouts;
  * no reference-repo code involved (the reference has no audio path).
  */
object Adpcm {
  /** IMA ADPCM step-size table — 89 entries, published constants. */
  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per 3-bit magnitude — published constants. */
  private val indexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  val blockAlign: Int = 256
  /** Samples per full mono block: 1 in the header + 2 per data byte. */
  val samplesPerBlock: Int = (blockAlign - 4) * 2 + 1 // 505

  private def clamp16(v: Int): Int = math.max(-32768, math.min(32767, v))
  private def clampIdx(v: Int): Int = math.max(0, math.min(88, v))

  /** The shared reconstruction step (encoder and decoder MUST agree on
    * it, or encoder state drifts from what the decoder will compute):
    * given the 4-bit code and the current (predictor, index), produce
    * the next (predictor, index). */
  /** The reconstruction step with the next (predictor, index) packed as
    * (predictor << 8) | index — predictor is int16 (sign survives the
    * arithmetic unpack shift), index is 0..88. Removes the per-nibble
    * pair allocation from the two-samples-per-byte decode loop (r19 mm
    * pass). */
  private def reconstructPacked(code: Int, predictor: Int, index: Int): Int = {
    val step = stepTable(index)
    var diff = step >> 3
    if ((code & 4) != 0) diff += step
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 1) != 0) diff += step >> 2
    val p = clamp16(if ((code & 8) != 0) predictor - diff else predictor + diff)
    (p << 8) | clampIdx(index + indexTable(code & 7))
  }

  /** Quantize one sample against the current state — the canonical IMA
    * bit-serial quantizer. */
  private def encodeNibble(sample: Int, predictor: Int, index: Int): Int = {
    var diff = sample - predictor
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    var s = stepTable(index)
    if (diff >= s) { code |= 4; diff -= s }
    s >>= 1
    if (diff >= s) { code |= 2; diff -= s }
    s >>= 1
    if (diff >= s) code |= 1
    code
  }

  /** Encode samples as an IMA-ADPCM RIFF/WAVE payload (mono, 4-bit,
    * format tag 0x0011, 256-byte blocks, fact chunk with the true
    * count; the final block may be short). */
  def encode(samples: Array[Int], sampleRate: Int = 16000): Array[Byte] = {
    val blocks = samples.grouped(samplesPerBlock).toArray
    val dataSize = blocks.map(g => 4 + (g.length - 1 + 1) / 2).sum
    val fmtSize = 20 // 16 base + cbSize(2) + samplesPerBlock(2)
    val riffSize = 4 + (8 + fmtSize) + (8 + 4) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(fmtSize)
      .putShort(0x0011) // WAVE_FORMAT_IMA_ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // avg bytes/sec
      .putShort(blockAlign.toShort)
      .putShort(4) // bits per (compressed) sample
      .putShort(2) // cbSize
      .putShort(samplesPerBlock.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    blocks.foreach { g =>
      var predictor = clamp16(g(0))
      var index = 0
      buf.putShort(predictor.toShort).put(index.toByte).put(0.toByte)
      var j = 1
      while (j < g.length) {
        val lo = encodeNibble(g(j), predictor, index)
        val st1 = reconstructPacked(lo, predictor, index)
        predictor = st1 >> 8; index = st1 & 0xff
        var byte = lo
        if (j + 1 < g.length) {
          val hi = encodeNibble(g(j + 1), predictor, index)
          val st2 = reconstructPacked(hi, predictor, index)
          predictor = st2 >> 8; index = st2 & 0xff
          byte |= hi << 4
        }
        buf.put(byte.toByte)
        j += 2
      }
    }
    buf.array()
  }

  /** Decode an IMA-ADPCM RIFF/WAVE payload: parse the container
    * (fmt / fact / data chunks), then decode block by block from each
    * block's own transmitted header state, truncating to the fact
    * chunk's sample count. */
  def decode(bytes: Array[Byte]): Array[Int] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(0) == 0x46464952, "not a RIFF payload") // "RIFF"
    require(buf.getInt(8) == 0x45564157, "not a WAVE form") // "WAVE"
    var pos = 12
    var bAlign = -1
    var spb = -1
    var nSamples = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length) {
      val id = buf.getInt(pos)
      val size = buf.getInt(pos + 4)
      id match {
        case 0x20746d66 => // "fmt "
          require(buf.getShort(pos + 8) == 0x0011,
            s"expected IMA ADPCM (0x11), got format ${buf.getShort(pos + 8)}")
          require(buf.getShort(pos + 10) == 1, "expected mono")
          require(buf.getShort(pos + 22) == 4, "expected 4-bit ADPCM")
          bAlign = buf.getShort(pos + 20) & 0xffff
          spb = buf.getShort(pos + 26) & 0xffff
        case 0x74636166 => // "fact"
          nSamples = buf.getInt(pos + 8)
        case 0x61746164 => // "data"
          dataOff = pos + 8
          dataLen = size
        case _ => () // skip unknown chunks (spec-conformant readers must)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(bAlign > 4 && spb > 0 && nSamples >= 0 && dataOff >= 0,
      "missing fmt/fact/data chunk")
    val out = new Array[Int](nSamples)
    var produced = 0
    var off = dataOff
    val end = dataOff + dataLen
    while (produced < nSamples && off < end) {
      var predictor = buf.getShort(off).toInt
      var index = buf.get(off + 2) & 0xff
      require(index <= 88, s"corrupt block header: step index $index")
      out(produced) = predictor
      produced += 1
      val inBlock = math.min(spb, nSamples - produced + 1)
      var j = 1
      var bo = off + 4
      while (j < inBlock) {
        val byte = buf.get(bo) & 0xff
        val st1 = reconstructPacked(byte & 0xf, predictor, index)
        predictor = st1 >> 8; index = st1 & 0xff
        out(produced) = predictor
        produced += 1
        j += 1
        if (j < inBlock) {
          val st2 = reconstructPacked(byte >> 4, predictor, index)
          predictor = st2 >> 8; index = st2 & 0xff
          out(produced) = predictor
          produced += 1
          j += 1
        }
        bo += 1
      }
      off += math.min(bAlign, 4 + (inBlock - 1 + 1) / 2)
    }
    require(produced == nSamples,
      s"decoded $produced of $nSamples declared samples")
    out
  }

  /** ADPCM-friendly deterministic source: a bounded random walk (brown
    * noise) — increment j is FNV("w:id:j") mapped to [-256, 255], the
    * sample is the running sum. The PCM corpus's white-noise samples
    * (fnvSample) defeat a DIFFERENTIAL codec by construction (no
    * sample-to-sample correlation to predict); the walk is the
    * deterministic stand-in for real audio's correlation, and the
    * oracle replays it as a per-media cumulative window sum. Stays
    * inside int16 for every corpus clip — pinned by AdpcmSpec, so the
    * oracle's unclamped cumsum is exact. */
  def walkSamples(id: Long, n: Int): Array[Int] = {
    // FNV-1a is byte-sequential, so the constant "w:<id>:" prefix folds
    // ONCE per clip and each sample folds only j's decimal digits —
    // byte-identical to hashing the full "w:<id>:<j>" string (ASCII =
    // UTF-8 here) without the per-sample String + UTF8String + full
    // re-hash the r18 shape paid (r19 mm pass; the winnowSel
    // one-encode discipline). walkStep stays as the one-sample
    // reference implementation (AdpcmSpec pins their equality).
    val prefix = s"w:$id:".getBytes("US-ASCII")
    var hp = 0xcbf29ce484222325L
    var i = 0
    while (i < prefix.length) {
      hp = (hp ^ (prefix(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    val digits = new Array[Byte](10)
    val out = new Array[Int](n)
    var acc = 0
    var j = 0
    while (j < n) {
      var h = hp
      var k = digits.length
      var m = j
      if (m == 0) { k -= 1; digits(k) = '0' }
      while (m > 0) { k -= 1; digits(k) = ('0' + m % 10).toByte; m /= 10 }
      while (k < digits.length) {
        h = (h ^ (digits(k) & 0xffL)) * 0x100000001b3L
        k += 1
      }
      acc += ((h & 0x1ff) - 256).toInt
      out(j) = acc
      j += 1
    }
    out
  }
  def walkStep(id: Long, j: Int): Int =
    ((graft.functions.TextHashKernels.rollingHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"w:$id:$j")) & 0x1ff)
      - 256).toInt
}
