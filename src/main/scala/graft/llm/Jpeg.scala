package graft.llm

/** Minimal BASELINE JPEG (JFIF) encoder — the compressed-codec half of
  * the MJPEG/AVI path (VERDICT r15 next §7: PNG, WAV, and the
  * uncompressed-DIB AVI decodes are real; this adds a real COMPRESSED
  * video codec so mm_* covers the shape production video actually
  * ships in). Encoder only: decoding goes through the JDK's own
  * ImageIO JPEG reader (the encodePng/AudioSystem standard-library
  * discipline), which makes the pair a genuine cross-implementation
  * check — our bitstream against an independent decoder neither side
  * can echo.
  *
  * Scope: baseline sequential DCT, 8-bit, 4:4:4 (no chroma
  * subsampling), one all-ones quantization table and the Annex K
  * luminance Huffman tables shared by all three components — all
  * legal per ITU-T T.81, chosen so quantization loss is just the
  * DCT/color-space round trip (max channel error a few counts,
  * pinned in MjpegSpec). Constants below are the published JPEG
  * Annex K tables — public standard material. */
private[llm] object Jpeg {

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
  // natural index -> zigzag position
  private val invZigzag: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(zigzag(i)) = i; i += 1 }
    inv
  }
  // Quantization in zigzag order: DC = 1 (lossless but for DCT
  // rounding; DC differences stay within Huffman category 11), AC = 2
  // (an all-ones table would let extreme blocks reach |coef| ~1025 —
  // category 11, which the baseline AC tables cannot code; halving
  // bounds AC at ~513, category 10, always codable).
  private val quant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 1 else 2)

  // Annex K luminance tables: counts of codes per length 1..16, then
  // the symbol values in code order
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman (code, length) per symbol from (bits, vals). */
  private def canonical(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }
  private val dcCodes = canonical(dcBits, dcVals)
  private val acCodes = canonical(acBits, acVals)

  // forward DCT basis: cos((2x+1)·u·π/16), with the 1/√2 factor folded
  // into row/col 0
  private val dctC: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    if (u == 0) c / math.sqrt(2.0) else c
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // marker stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per T.81
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Encode one top-down row-major RGB frame (3·w·h values in [0,256))
    * as a self-contained baseline JFIF JPEG. */
  private[llm] def encodeFrame(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 / JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // no density units, 1:1
    out.write(0); out.write(0) // no thumbnail
    marker(0xdb); u16(67); out.write(0x00) // DQT: table 0, 8-bit
    var i = 0
    while (i < 64) { out.write(quant(i)); i += 1 } // near-lossless
    marker(0xc0); u16(17) // SOF0: 8-bit, 3 components, 4:4:4
    out.write(8); u16(h); u16(w); out.write(3)
    var comp = 1
    while (comp <= 3) { out.write(comp); out.write(0x11); out.write(0); comp += 1 }
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(clazz << 4) // class, table id 0
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, dcBits, dcVals)
    dht(1, acBits, acVals)
    marker(0xda); u16(12); out.write(3) // SOS
    comp = 1
    while (comp <= 3) { out.write(comp); out.write(0x00); comp += 1 }
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al

    // color transform to level-shifted YCbCr planes, edge-replicated to
    // whole MCUs
    val mw = (w + 7) & ~7
    val mh = (h + 7) & ~7
    val planes = Array.ofDim[Double](3, mw * mh)
    var y = 0
    while (y < mh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < mw) {
        val sx = math.min(x, w - 1)
        val base = (sy * w + sx) * 3
        val r = px(base); val g = px(base + 1); val b = px(base + 2)
        planes(0)(y * mw + x) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        planes(1)(y * mw + x) = -0.168736 * r - 0.331264 * g + 0.5 * b
        planes(2)(y * mw + x) = 0.5 * r - 0.418688 * g - 0.081312 * b
        x += 1
      }
      y += 1
    }

    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val dcPred = new Array[Int](3)
    var my = 0
    while (my < mh / 8) {
      var mx = 0
      while (mx < mw / 8) {
        var c = 0
        while (c < 3) {
          val p = planes(c)
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              block(by * 8 + bx) = p((my * 8 + by) * mw + mx * 8 + bx)
              bx += 1
            }
            by += 1
          }
          // 2-D DCT-II + quantize (q = 1 ⇒ plain rounding) + zigzag
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0.0
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  s += block(yy * 8 + xx) * dctC(u)(yy) * dctC(v)(xx)
                  xx += 1
                }
                yy += 1
              }
              val zz = invZigzag(u * 8 + v)
              coef(zz) = math.round(0.25 * s / quant(zz)).toInt
              v += 1
            }
            u += 1
          }
          // DC: predicted difference
          val diff = coef(0) - dcPred(c)
          dcPred(c) = coef(0)
          val dcat = category(diff)
          val (dc, dl) = dcCodes(dcat)
          bw.write(dc, dl)
          if (dcat > 0)
            bw.write(if (diff < 0) diff + (1 << dcat) - 1 else diff, dcat)
          // AC: run-length + category
          var run = 0
          var k = 1
          while (k < 64) {
            if (coef(k) == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acCodes(0xf0); bw.write(zc, zl); run -= 16
              }
              val cat = category(coef(k))
              val (ac, al) = acCodes((run << 4) | cat)
              bw.write(ac, al)
              bw.write(if (coef(k) < 0) coef(k) + (1 << cat) - 1 else coef(k), cat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (eb, el) = acCodes(0x00); bw.write(eb, el) } // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
