package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels, callable from both interpreted eval and generated
  * Java (the codegen path references these by their JVM-static forwarders,
  * so the expressions below stay inside whole-stage codegen). */
object TextHashKernels {
  /** 64-bit polynomial rolling hash over UTF-8 bytes (base 1099511628211,
    * wrapping mod 2^64 — the FNV-1a prime). The streaming/rolling shape is
    * the document-fingerprinting primitive from the LLM-pipeline extension
    * (SURVEY §7.4-8): one pass, O(1) state per document. */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a of one token — the per-token hash feeding simhash. */
  def fnv64(s: UTF8String): Long = rollingHash(s)

  /** Winnowing selection over 8-codepoint-gram md5 hashes with a w=4
    * rightmost-min window — the fused kernel behind [[WinnowSel]].
    * Gram positions are codepoint-based (SQL substr semantics) and the
    * hash order is lexicographic on the md5 hex string, both exactly
    * what the declarative DuckDB twin computes. Docs under 11
    * codepoints return an empty array (the 'short' branch). */
  private val HEX = "0123456789abcdef".toCharArray

  def winnowSel(s: UTF8String, withPositions: Boolean): ArrayData = {
    val str = s.toString
    val sl = str.length
    // one UTF-8 encode of the whole document + codepoint→byte offsets,
    // replacing the r13-era per-gram `new String(cps, i, 8).getBytes`
    // (string alloc + encoder per gram — the dominant cost at ~2 µs per
    // gram, measured in OPTIMIZATION_r18.md). Unpaired surrogates
    // encode as '?' exactly as Java's encoder does, so gram bytes are
    // byte-identical to the per-gram encode.
    var n = 0
    var si = 0
    while (si < sl) { si += Character.charCount(str.codePointAt(si)); n += 1 }
    if (n < 11) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](n + 1)
    val bytes = new Array[Byte](sl * 3 + 8) // worst case 3B/char (4B cp = 2 chars)
    var bi = 0
    var ci = 0
    si = 0
    while (si < sl) {
      val cp = str.codePointAt(si)
      off(ci) = bi
      if (cp < 0x80) { bytes(bi) = cp.toByte; bi += 1 }
      else if (cp < 0x800) {
        bytes(bi) = (0xc0 | (cp >> 6)).toByte
        bytes(bi + 1) = (0x80 | (cp & 0x3f)).toByte
        bi += 2
      } else if (cp >= 0xd800 && cp <= 0xdfff) { bytes(bi) = '?'; bi += 1 }
      else if (cp < 0x10000) {
        bytes(bi) = (0xe0 | (cp >> 12)).toByte
        bytes(bi + 1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        bytes(bi + 2) = (0x80 | (cp & 0x3f)).toByte
        bi += 3
      } else {
        bytes(bi) = (0xf0 | (cp >> 18)).toByte
        bytes(bi + 1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
        bytes(bi + 2) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        bytes(bi + 3) = (0x80 | (cp & 0x3f)).toByte
        bi += 4
      }
      si += Character.charCount(cp)
      ci += 1
    }
    off(n) = bi
    val m = n - 7
    // each gram's md5 packed into two longs (big-endian), compared
    // UNSIGNED — which is exactly lexicographic order of the hex
    // string the r13 kernel compared (byte b ↦ its two hex digits is
    // monotone in the unsigned byte value), so every window selects
    // the identical gram; hex is materialized only for SELECTED
    // positions, memoized per position.
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val hhi = new Array[Long](m)
    val hlo = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.update(bytes, off(i), off(i + 8) - off(i))
      md.digest(dig, 0, 16)
      var hi = 0L
      var lo = 0L
      var b = 0
      while (b < 8) { hi = (hi << 8) | (dig(b) & 0xffL); b += 1 }
      while (b < 16) { lo = (lo << 8) | (dig(b) & 0xffL); b += 1 }
      hhi(i) = hi
      hlo(i) = lo
      i += 1
    }
    // <= 0 keeps the RIGHTMOST minimum, as before
    def leq(x: Int, y: Int): Boolean = {
      val c = java.lang.Long.compareUnsigned(hhi(x), hhi(y))
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(hlo(x), hlo(y)) <= 0
    }
    def hex32(p: Int, outb: Array[Byte], o: Int): Unit = {
      var b = 0
      var q = o
      while (b < 8) {
        val v = ((hhi(p) >>> ((7 - b) * 8)) & 0xffL).toInt
        outb(q) = HEX(v >> 4).toByte; outb(q + 1) = HEX(v & 0xf).toByte
        b += 1; q += 2
      }
      b = 0
      while (b < 8) {
        val v = ((hlo(p) >>> ((7 - b) * 8)) & 0xffL).toInt
        outb(q) = HEX(v >> 4).toByte; outb(q + 1) = HEX(v & 0xf).toByte
        b += 1; q += 2
      }
    }
    val nw = m - 3
    if (withPositions) {
      // positioned fingerprints pack the 1-based position into a FIXED
      // 8-digit prefix parsed back with substr(pf, 1, 8); a position
      // ≥ 1e8 would overflow the width and silently corrupt every span
      // coordinate downstream (ADVICE r12) — fail loudly instead. A
      // 100M-codepoint single document is a pipeline bug, not data.
      if (m >= 100000000)
        throw new IllegalArgumentException(
          s"winnowSel(withPositions): document has $n codepoints; positions past " +
            "99,999,999 cannot be encoded in the 8-digit fingerprint prefix — " +
            "split or truncate the document upstream")
      val cache = new Array[UTF8String](m) // one "%08d:hex" per selected pos
      val out = new Array[Any](nw)
      var j = 0
      while (j < nw) {
        var pos = j
        var x = j + 1
        while (x <= j + 3) {
          if (leq(x, pos)) pos = x
          x += 1
        }
        var u = cache(pos)
        if (u == null) {
          val ob = new Array[Byte](41)
          var v = pos + 1
          var dI = 7
          while (dI >= 0) { ob(dI) = ('0' + v % 10).toByte; v /= 10; dI -= 1 }
          ob(8) = ':'
          hex32(pos, ob, 9)
          u = UTF8String.fromBytes(ob)
          cache(pos) = u
        }
        out(j) = u
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      val cache = new Array[String](m)
      var j = 0
      while (j < nw) {
        var pos = j
        var x = j + 1
        while (x <= j + 3) {
          if (leq(x, pos)) pos = x
          x += 1
        }
        var hx = cache(pos)
        if (hx == null) {
          val ob = new Array[Byte](32)
          hex32(pos, ob, 0)
          hx = new String(ob, java.nio.charset.StandardCharsets.US_ASCII)
          cache(pos) = hx
        }
        seen.add(hx)
        j += 1
      }
      val out = new Array[Any](seen.size)
      var idx = 0
      val it = seen.iterator()
      while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
      new GenericArrayData(out)
    }
  }

  /** splitmix64 (Steele–Lea–Flood 2014) — the one deterministic 64-bit
    * mixer every derived constant table in this library draws from:
    * pure wrap-mod-2⁶⁴ integer algebra, so the DuckDB twins regenerate
    * IDENTICAL tables from the same three constants (see
    * [[TextHashes.gearTableCtes]] / [[TextHashes.permTableCtes]]). */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FastCDC gear table (Xia et al., USENIX ATC 2016): 256 uniform
    * 64-bit constants, one per byte value. */
  val GEAR: Array[Long] = Array.tabulate(256)(b => splitmix64(b.toLong))

  /** Universal-hash permutation family over a 64-bit base hash (the
    * one-hash MinHash cost cut, Appleby/Broder practice): perm i maps
    * h ↦ (Aᵢ·h + Bᵢ) mod 2⁶⁴ with Aᵢ odd (a bijection mod 2⁶⁴). The
    * [[permHash]] value is returned with the TOP BIT FLIPPED, which
    * makes SIGNED Long order equal UNSIGNED order of the affine value
    * — so a plain Spark `min` aggregate selects the true unsigned
    * minimum, and the DuckDB twin's HUGEINT `min` (natively unsigned)
    * selects the same element. Equality comparisons are flip-
    * invariant, so cross-source signature matches agree exactly. */
  val PERM_A: Array[Long] = Array.tabulate(64)(i => splitmix64(1000L + i) | 1L)
  val PERM_B: Array[Long] = Array.tabulate(64)(i => splitmix64(2000L + i))
  def permHash(h: Long, i: Int): Long =
    (PERM_A(i) * h + PERM_B(i)) ^ java.lang.Long.MIN_VALUE

  /** Content-defined chunking (the fused kernel behind dd_cdc): the
    * FastCDC rolling GEAR hash decides the cuts — position i (1-based,
    * 2 .. n−7) cuts when the top 4 bits of the window hash are zero
    * (P = 1/16), where the window hash over the 8 codepoints starting
    * at i is h = Σ GEAR[cp & 0xff] · 2^(7−k) mod 2⁶⁴, maintained by the
    * O(1) rolling update h′ = (h − GEAR[out]·2⁷)·2 + GEAR[in]: two
    * table lookups + shift-adds per position, zero allocation. The
    * first cut was an md5 over a freshly-allocated 8-codepoint string
    * PER POSITION (string alloc + UTF-8 encode + full digest just to
    * test 4 bits — VERDICT r13 next §1); the gear roll removes that
    * constant, and being pure integer algebra it replays exactly in
    * the DuckDB twin (the dq_dp_geo precedent). Chunks then hash once
    * each with md5, emitting (chunk md5 hex, chunk codepoint length).
    * Value-identical to the oracle's list-algebra replay: same gear
    * table, same positions, same chunk md5s. */
  def cdcChunks(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(dig: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder(32)
      var b = 0
      while (b < 16) {
        sb.append(Character.forDigit((dig(b) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(dig(b) & 0xf, 16))
        b += 1
      }
      sb.toString
    }
    val cuts = collection.mutable.ArrayBuffer[Int]() // 1-based positions
    if (n >= 9) {
      // window hash at position 1 (cps 0..7), then roll
      var h = 0L
      var k = 0
      while (k < 8) { h += GEAR(cps(k) & 0xff) << (7 - k); k += 1 }
      var i = 2
      while (i <= n - 7) {
        h = ((h - (GEAR(cps(i - 2) & 0xff) << 7)) << 1) + GEAR(cps(i + 6) & 0xff)
        if ((h >>> 60) == 0L) cuts += i
        i += 1
      }
    }
    val starts = 1 +: cuts
    val ends = cuts :+ (n + 1)
    val out = new Array[Any](starts.length)
    var k = 0
    while (k < starts.length) {
      val s0 = starts(k); val e0 = ends(k)
      val chunk = new String(cps, s0 - 1, e0 - s0)
      val dig = md.digest(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(hex(dig)), (e0 - s0).toLong)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Seed-and-extend maximal shared-substring spans (the cross-document
    * exact substring dedup kernel behind dd_substr — Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", 2022,
    * re-expressed over winnowing seeds instead of a suffix array).
    * Inputs: two documents and the aligned seed position lists (1-based
    * codepoint gram starts, SQL substr semantics — the positions the
    * [[winnowSel]] fingerprints carry). Each seed extends left and right
    * while codepoints match; seeds on the SAME diagonal (ap − bp) that
    * fall inside an already-extended run are skipped, so the per-pair
    * cost is O(Σ run length per diagonal), not O(seeds × run length) —
    * a near-copy pair with L/2.5 fingerprint seeds in one long span
    * pays for the span once. Output: the DISTINCT maximal aligned spans
    * of length ≥ minLen as (a_start, a_len, b_start) rows, 1-based,
    * sorted by (a_start, b_start) — replayed verbatim by the DuckDB
    * twin, which extends EVERY seed and DISTINCTs (a seed inside a run
    * extends to the same maximal run, so the sets are provably equal). */
  def substrExtend(a: UTF8String, b: UTF8String, aps: ArrayData, bps: ArrayData,
      minLen: Int): ArrayData = {
    val ca = a.toString.codePoints().toArray
    val cb = b.toString.codePoints().toArray
    val n = aps.numElements()
    // diagonal → sorted distinct seed a-positions
    val byDiag = new java.util.TreeMap[Long, java.util.TreeSet[Long]]()
    var i = 0
    while (i < n) {
      val ap = aps.getLong(i)
      val bp = bps.getLong(i)
      var set = byDiag.get(ap - bp)
      if (set == null) { set = new java.util.TreeSet[Long](); byDiag.put(ap - bp, set) }
      set.add(ap)
      i += 1
    }
    val spans = collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val dit = byDiag.entrySet().iterator()
    while (dit.hasNext) {
      val e = dit.next()
      val diag = e.getKey
      var runEnd = Long.MinValue // exclusive end of the last run, a-coords
      val ait = e.getValue.iterator()
      while (ait.hasNext) {
        val ap = ait.next()
        if (ap >= runEnd) {
          val bp = ap - diag
          // seed positions are 1-based codepoint indexes into ca/cb —
          // JVM arrays, so anything outside [1, 2³¹) is corrupt input
          // (an overflowed fingerprint prefix, a foreign index): fail
          // loudly rather than truncate through toInt (ADVICE r12)
          if (ap < 1L || ap > ca.length || bp < 1L || bp > cb.length)
            throw new IllegalArgumentException(
              s"substrExtend: seed position out of range (a=$ap/${ca.length}, " +
                s"b=$bp/${cb.length}) — corrupt span index")
          val a0 = ap.toInt - 1 // 0-based seed index in ca
          val b0 = bp.toInt - 1
          var l = 0
          while (a0 - l - 1 >= 0 && b0 - l - 1 >= 0 && ca(a0 - l - 1) == cb(b0 - l - 1)) l += 1
          var r = 0
          while (a0 + r < ca.length && b0 + r < cb.length && ca(a0 + r) == cb(b0 + r)) r += 1
          runEnd = ap + r
          if (l + r >= minLen) spans += ((ap - l, (l + r).toLong, bp - l))
        }
      }
    }
    val sorted = spans.sortBy(t => (t._1, t._3))
    new GenericArrayData(sorted.map(t =>
      org.apache.spark.sql.catalyst.InternalRow(t._1, t._2, t._3): Any).toArray)
  }

  /** 27-bin character entropy (a–z + space, nats) — single byte pass +
    * fixed-order fold, the fused form of the 27-term declarative chain
    * the ts_entropy oracle replays (len − len(replace)) per symbol.
    * Bit-faithful to that chain: p = count/numChars with the identical
    * int→double conversions, terms added in alphabet order a..z then
    * space, zero bins skipped (IEEE x + 0.0 == x for these
    * non-negative accumulations). Counting is per BYTE, which equals
    * the twin's per-char counts on the ASCII corpora the gate runs
    * (the fnvFoldSql convention). */
  def charEntropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val counts = new Array[Int](27)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      else if (b == ' ') counts(26) += 1
      i += 1
    }
    val len = s.numChars().toDouble
    var h = 0.0
    var j = 0
    while (j < 27) {
      val n = counts(j)
      if (n > 0) {
        val p = n / len
        h += -(p * math.log(p))
      }
      j += 1
    }
    h
  }

  /** Count of space-delimited tokens of `text` that appear in `set` —
    * the stopword/marker counting primitive behind quality scoring and
    * language ID. One pass over the bytes, zero allocation: splitting on
    * the ASCII space is UTF-8 safe, and the candidate sets are tiny
    * (3–7 entries) so a linear byte-compare beats a hash set. Token
    * boundaries match `split(text, ' ')` with limit -1: consecutive
    * spaces yield empty tokens, which never match a non-empty set. */
  def countTokensInSet(text: UTF8String, set: Array[UTF8String]): Long = {
    var count = 0L
    val n = text.numBytes()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.getByte(i) == ' ') {
        val len = i - start
        var k = 0
        var matched = false
        while (k < set.length && !matched) {
          val t = set(k)
          if (t.numBytes() == len) {
            var j = 0
            var eq = true
            while (j < len && eq) {
              if (text.getByte(start + j) != t.getByte(j)) eq = false
              j += 1
            }
            matched = eq
          }
          k += 1
        }
        if (matched) count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** All 3-token shingles of `text`, assembled in ONE scan-local pass
    * over the bytes — the shuffle-free replacement for the
    * posexplode + window-lead shape, whose `lead` forced a full
    * shuffle of the exploded token rows onto doc_id before a single
    * shingle existed (at 100 TB that shuffle IS the corpus). Token
    * boundaries match `split(text, ' ')` with limit -1 (consecutive
    * spaces yield empty tokens; trailing empties kept), so the emitted
    * shingles are byte-identical to the windowed form's
    * `concat_ws(" ", tok, t1, t2)`. */
  def shingles3(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var m = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') m += 1; i += 1 }
    if (m < 3) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var t = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](m - 2)
    var k = 0
    while (k < m - 2) {
      val len = (ends(k) - starts(k)) + (ends(k + 1) - starts(k + 1)) +
        (ends(k + 2) - starts(k + 2)) + 2
      val sb = new Array[Byte](len)
      var p = 0
      var w = k
      while (w <= k + 2) {
        var q = starts(w)
        while (q < ends(w)) { sb(p) = bytes(q); p += 1; q += 1 }
        if (w < k + 2) { sb(p) = ' '; p += 1 }
        w += 1
      }
      out(k) = UTF8String.fromBytes(sb)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array: each token votes its hash bits
    * (+1 for a set bit, -1 for a clear bit); the sign of each tally is
    * the fingerprint bit. Near-duplicate documents differ in few bits. */
  def simHash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv64(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `roll_hash(text)` — document fingerprint as a native Catalyst
  * expression with codegen (no UDF serialization, stays inside
  * whole-stage codegen; SURVEY §7.3 preference order (b)). */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"roll_hash needs a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_sel(text)` — winnowing fingerprint selection (Schleimer et
  * al. 2003) as one fused codegen'd pass: md5 every 8-codepoint gram,
  * slide the w=4 window, emit each window's rightmost minimum. The
  * declarative HOF chain it replaces (transform over windows, each
  * doing slice+reverse+array_position+array_min — all interpreted per
  * element) measured 11.5 s for 5k sf0.1 docs; the kernel is one tight
  * loop with a reused MessageDigest. withPositions=true → one
  * "%08d:hash" string per window (ts_winnow's sel relation, duplicates
  * kept so n_windows survives); false → the DISTINCT hash-only
  * fingerprints (dd_winnow's join keys). */
case class WinnowSel(child: Expression, withPositions: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_sel needs a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.winnowSel(input.asInstanceOf[UTF8String], withPositions)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.winnowSel($c, $withPositions)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cdc_chunks(text)` — content-defined chunking as one fused
  * codegen'd pass (see [[TextHashKernels.cdcChunks]]): gram hashing,
  * mask cuts, and chunk hashing in a single tight loop with a reused
  * MessageDigest. */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ch", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("clen", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.cdcChunks(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.cdcChunks($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `perm_hash_i(h)` — the i-th affine MinHash permutation of a 64-bit
  * base hash as native codegen (see [[TextHashKernels.permHash]]).
  * Native because the multiply WRAPS mod 2⁶⁴ by design — under the
  * session's ANSI mode the equivalent SQL `a * h` would throw on
  * overflow, and the wrap IS the algebra the DuckDB twin replays. */
case class PermHash(child: Expression, i: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"perm_hash needs a bigint argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.permHash(input.asInstanceOf[Long], i)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.permHash($c, $i)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `substr_extend(text_a, text_b, aps, bps)` — maximal shared-substring
  * spans from aligned winnow seeds (see [[TextHashKernels.substrExtend]]).
  * Interpreted eval (CodegenFallback, the SimHash precedent): the
  * per-pair diagonal-walk loop dominates, codegen buys nothing. */
case class SubstrExtend(ta: Expression, tb: Expression, pa: Expression,
    pb: Expression, minLen: Int) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ta, tb, pa, pb)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a_start", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("a_len", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("b_start", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes() =
    if (ta.dataType == StringType && tb.dataType == StringType &&
        pa.dataType.isInstanceOf[ArrayType] && pb.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "substr_extend needs (string, string, array<long>, array<long>)")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = ta.eval(input); val b = tb.eval(input)
    val ap = pa.eval(input); val bp = pb.eval(input)
    if (a == null || b == null || ap == null || bp == null) null
    else TextHashKernels.substrExtend(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], ap.asInstanceOf[ArrayData],
      bp.asInstanceOf[ArrayData], minLen)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(ta = c(0), tb = c(1), pa = c(2), pb = c(3))
}

/** `sim_hash(tokens)` — 64-bit SimHash of an array<string> column.
  * Interpreted eval only (CodegenFallback): the per-token 64-bit vote
  * loop dominates, so codegen buys little here; the expression still
  * avoids UDF encode/decode overhead by reading ArrayData directly. */
case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sim_hash needs array<string>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simHash(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `shingles3(text)` — the 3-token shingle array of a document as one
  * codegen'd scan-local expression (see [[TextHashKernels.shingles3]]
  * for why: it deletes the corpus-wide window shuffle every shingle
  * consumer used to pay before this existed). */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingles3 needs a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.shingles3(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.shingles3($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_entropy(text)` — 27-bin character entropy in nats, fused
  * single-pass with codegen. Replaces a 27-term chained projection
  * (each term two length() calls over a translate copy) that blew the
  * whole-stage-codegen expression budget and fell back to interpreted
  * eval — ~9 s for 50k docs; the fused kernel is one byte pass. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.charEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `tokens_in_set_count(text)` — count of whitespace tokens belonging to
  * a fixed small set, fused split+membership with codegen. Replaces the
  * explode → conditional-aggregate shape for stopword/marker counting:
  * same result, but one scan-project with NO shuffle (the exploded form
  * shuffled O(tokens) rows where O(docs) suffice — VERDICT r2 §wrong 4). */
case class TokensInSetCount(child: Expression, tokens: Seq[String]) extends UnaryExpression {
  private lazy val set: Array[UTF8String] = tokens.map(UTF8String.fromString).toArray
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tokens_in_set_count needs a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.countTokensInSet(input.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSet", set,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.countTokensInSet($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashes {
  /** DuckDB replay of the FNV-1a/64 byte fold (the [[RollingHash]]
    * kernel) over a SQL string expression — the ONE definition every
    * oracle twin builds from (TextOps, Curate, Multimodal); a fix to
    * the fold lands everywhere at once. HUGEINT keeps the 104-bit
    * products exact; xor only touches the low byte. `string_split(x,
    * '')` yields chars = bytes on the ASCII corpora these twins run
    * against. Returns the raw unsigned fold as HUGEINT. */
  def fnvFoldSql(expr: String): String =
    fnvExtSql("14695981039346656037::HUGEINT", expr)

  /** The fold CONTINUED from an arbitrary state (r13 oracle-cost work):
    * FNV-1a is byte-sequential — fnv(s ‖ t) = fold(fnv(s), t) exactly —
    * so twins whose inputs share long prefixes (the multimodal pixel
    * grids: "id:x:y:c" per channel) stage the prefix fold once per
    * (id,x,y) and extend by the 1-byte channel, instead of re-folding
    * the whole string per pixel. `init` is a HUGEINT SQL expression
    * holding the fold state after the prefix. Bit-identical by the
    * sequential-fold identity; verified by the unchanged gate hashes. */
  def fnvExtSql(init: String, expr: String): String =
    s"""list_reduce(
       |    list_prepend(($init),
       |      [ord(c)::HUGEINT for c in string_split($expr, '')]),
       |    (acc, x) -> ((acc - (acc % 256) + xor((acc % 256)::BIGINT, x::BIGINT)::HUGEINT)
       |                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
       |  )""".stripMargin

  /** uint64 x → signed BIGINT (DuckDB xor() is BIGINT-only). */
  private def u2s(x: String): String =
    s"""(CASE WHEN ($x) >= 9223372036854775808::HUGEINT
       | THEN (($x) - 18446744073709551616::HUGEINT)::BIGINT ELSE ($x)::BIGINT END)""".stripMargin
  /** signed BIGINT → uint64 held as HUGEINT. */
  private def s2u(x: String): String =
    s"""(CASE WHEN ($x) < 0 THEN ($x)::HUGEINT + 18446744073709551616::HUGEINT
       | ELSE ($x)::HUGEINT END)""".stripMargin
  /** xor of two uint64 HUGEINTs, via the signed round-trip. */
  private def xor64(a: String, b: String): String =
    s2u(s"xor(${u2s(a)}, ${u2s(b)})")
  /** (a · c) mod 2⁶⁴ without overflowing INT128: a split into 32-bit
    * halves, each partial < 2⁹⁶ (two uint64 factors multiply to 2¹²⁸,
    * past signed HUGEINT — the fnvExtSql fold never hits this because
    * its multiplier is only 40 bits). */
  private def mulmod64(a: String, c: String): String =
    s"""(((($a) % 4294967296::HUGEINT) * $c::HUGEINT
       | + (((($a) // 4294967296::HUGEINT) * $c::HUGEINT) % 4294967296::HUGEINT)
       | * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin

  /** DuckDB regeneration of [[TextHashKernels.GEAR]]: splitmix64 over
    * b = 0..255 in HUGEINT algebra (unsigned shifts as floor division,
    * xor through the signed-BIGINT round-trip, the two multiplies
    * split-32 to stay inside INT128) — 256 rows once per query, then a
    * 1-row `gear(gr)` relation every consumer cross-joins (the
    * constant-width broadcast shape). Bit-identical to the engine
    * table: the CdcSpec replay and the dd_cdc gate both pin it. */
  def gearTableCtes: String = {
    val s30 = "1073741824::HUGEINT"   // 2^30
    val s27 = "134217728::HUGEINT"    // 2^27
    val s31 = "2147483648::HUGEINT"   // 2^31
    s"""gb AS (SELECT b FROM range(0, 256) t(b)),
       | g0 AS (SELECT b, (b::HUGEINT + 11400714819323198485::HUGEINT) AS z0 FROM gb),
       | g1 AS (SELECT b, ${mulmod64(xor64("z0", s"z0 // $s30"), "13787848793156543929")} AS z1 FROM g0),
       | g2 AS (SELECT b, ${mulmod64(xor64("z1", s"z1 // $s27"), "10723151780598845931")} AS z2 FROM g1),
       | g3 AS (SELECT b, ${xor64("z2", s"z2 // $s31")} AS g FROM g2),
       | gear AS (SELECT list(g ORDER BY b) AS gr FROM g3)""".stripMargin
  }

  /** DuckDB regeneration of [[TextHashKernels.PERM_A]]/[[PERM_B]]: the
    * same splitmix64 over 1000+i / 2000+i, Aᵢ forced odd with integer
    * algebra (a − a%2 + 1 ≡ a|1 for the low bit). Yields a k-row
    * `perms(i, a, b)` relation of HUGEINT uint64 values. */
  def permTableCtes(k: Int): String = {
    val s30 = "1073741824::HUGEINT"
    val s27 = "134217728::HUGEINT"
    val s31 = "2147483648::HUGEINT"
    def mix(pfx: String, in: String): String =
      s"""${pfx}0 AS (SELECT i, ($in)::HUGEINT + 11400714819323198485::HUGEINT AS z0 FROM pb),
         | ${pfx}1 AS (SELECT i, ${mulmod64(xor64("z0", s"z0 // $s30"), "13787848793156543929")} AS z1 FROM ${pfx}0),
         | ${pfx}2 AS (SELECT i, ${mulmod64(xor64("z1", s"z1 // $s27"), "10723151780598845931")} AS z2 FROM ${pfx}1),
         | ${pfx}3 AS (SELECT i, ${xor64("z2", s"z2 // $s31")} AS g FROM ${pfx}2)""".stripMargin
    s"""pb AS (SELECT i FROM range(0, $k) t(i)),
       | ${mix("pa", "1000 + i")},
       | ${mix("pq", "2000 + i")},
       | perms AS (SELECT pa3.i, pa3.g - (pa3.g % 2) + 1 AS a, pq3.g AS b
       |           FROM pa3 JOIN pq3 USING (i))""".stripMargin
  }

  /** (h·a + b) mod 2⁶⁴ over HUGEINT uint64 expressions — the affine
    * MinHash permutation the perms relation parameterizes; bit-equal
    * to [[TextHashKernels.permHash]] minus the top-bit flip (which the
    * HUGEINT min makes unnecessary: it is natively unsigned). */
  def affinePermSql(h: String, a: String, b: String): String =
    s"(${mulmod64(h, a)} + $b) % 18446744073709551616::HUGEINT"

  /** The fold reinterpreted as the engine's signed Long. Takes the name
    * of a column holding the HUGEINT fold. */
  def fnvSignedSql(hu: String): String =
    s"""CASE WHEN $hu >= 9223372036854775808::HUGEINT
       |   THEN ($hu - 18446744073709551616::HUGEINT)::BIGINT ELSE $hu::BIGINT END""".stripMargin

  /** DuckDB replay of the positioned winnowing window selection (the
    * [[TextHashKernels.winnowSel]] w=4 rightmost-min), as cascaded
    * scalar comparisons instead of list_reverse/list_position/list_min
    * over sliced windows: zero list allocations per window, ~4× less
    * oracle wall-clock, IDENTICAL selection — the cascade tests the
    * rightmost index first, so ties resolve right, exactly the
    * list_position(list_reverse(...)) semantics. Emits the packed
    * '%08d:<fp>' strings the twins parse back. `hs` names a list
    * column of gram hashes. */
  def winnowWindowSql(hs: String): String =
    // single-line continuations ending in `||`, never starting with it:
    // callers interpolate this into their own stripMargin strings, and
    // a leading `||` would lose a pipe to the outer strip
    s"""list_transform(range(1, len($hs) - 4 + 2), j ->
       |     printf('%08d', CASE
       |       WHEN $hs[j+3] <= least($hs[j], $hs[j+1], $hs[j+2]) THEN j+3
       |       WHEN $hs[j+2] <= least($hs[j], $hs[j+1]) THEN j+2
       |       WHEN $hs[j+1] <= $hs[j] THEN j+1 ELSE j END) || ':' ||
       |     least($hs[j], $hs[j+1], $hs[j+2], $hs[j+3]))""".stripMargin

  /** DuckDB replay of the [[substrExtend]] seed extension as a BINARY
    * SEARCH on prefix equality (r13 oracle-cost work): the linear
    * first-mismatch scan materialized an O(position)-long list PER SEED
    * (372k seeds × ~300 lambda evals at sf0.01 — ~70 s of the gate's
    * DuckDB budget per substr twin); prefix equality is downward-closed,
    * so the mismatch point is the max L with
    * substr(xa, ap−L, L) = substr(xb, bp−L, L) — one C-speed memcmp per
    * probe, 14 probes per side (2¹⁴ = 16384 ≥ any corpus doc length).
    * Exactly ONE MATERIALIZED fence, on the FINAL step: the
    * intermediate steps are single-referenced CTEs (linear inlining,
    * and per-step materialization measured 1.8× slower — each copy
    * rewrites the carried text columns), but the fence at the end is
    * load-bearing — downstream consumers reference ll/rl several times
    * (span start/len/md5/threshold), and without it each reference
    * re-inlines the whole 14-level chain and the multiply-referenced
    * bound columns inside every level compound EXPONENTIALLY (measured:
    * the un-fenced form did not finish in 10 minutes; the same blowup
    * killed the nested-subquery prototype and the Classifier
    * trainCtes). Returns the CTE list fragment and the final CTE's
    * name; the final relation carries `carry` plus ll/rl = the
    * left/right extension lengths, value-equal to the linear scan's
    * l_len/r_len (verified row-identical on the sf0.01 corpus). `src`
    * must provide `carry` ⊇ {ap, bp, xa, xb}. */
  def binExtendCtes(pfx: String, src: String, carry: Seq[String],
      ap: String, bp: String, xa: String, xb: String,
      na: String, nb: String): (String, String) = {
    val steps = 14
    val keep = carry.mkString(", ")
    // LOUD bound guard (ADVICE r13): 14 halvings are exact only while
    // every search interval fits 2^14 = 16384 — i.e. docs up to 16384
    // codepoints (gate corpora max ~600). A longer doc used to silently
    // under-extend and hash-mismatch with no hint why; now the oracle
    // itself aborts with the bound named, so a larger-sf corpus fails
    // fast instead of red-with-no-cause. The guard costs one comparison
    // per seed; error() only evaluates on the violating branch.
    val bound = 1 << steps
    def guarded(e: String): String =
      s"""CASE WHEN greatest(least($ap, $bp) - 1, least($na - $ap, $nb - $bp) + 1) >= $bound
         |   THEN CAST(error('binExtendCtes: extension interval exceeds 2^$steps=$bound codepoints — raise the step count for this corpus') AS BIGINT)
         |   ELSE CAST($e AS BIGINT) END""".stripMargin
    val first =
      s"""${pfx}0 AS (SELECT $keep, CAST(0 AS BIGINT) AS ll,
         |   ${guarded(s"least($ap, $bp) - 1")} AS lh, CAST(0 AS BIGINT) AS rl,
         |   ${guarded(s"least($na - $ap, $nb - $bp) + 1")} AS rh FROM $src)""".stripMargin
    val stepCtes = (1 to steps).map { k =>
      val mat = if (k == steps) "MATERIALIZED " else ""
      s"""$pfx$k AS $mat(SELECT $keep,
         |   CASE WHEN lp THEN lm ELSE ll END AS ll,
         |   CASE WHEN lp THEN lh ELSE lm - 1 END AS lh,
         |   CASE WHEN rp THEN rm ELSE rl END AS rl,
         |   CASE WHEN rp THEN rh ELSE rm - 1 END AS rh
         |  FROM (SELECT $keep, ll, lh, rl, rh, lm, rm,
         |   CASE WHEN ll < lh THEN substr($xa, CAST($ap - lm AS INT), CAST(lm AS INT))
         |        = substr($xb, CAST($bp - lm AS INT), CAST(lm AS INT)) ELSE false END AS lp,
         |   CASE WHEN rl < rh THEN substr($xa, CAST($ap AS INT), CAST(rm AS INT))
         |        = substr($xb, CAST($bp AS INT), CAST(rm AS INT)) ELSE false END AS rp
         |  FROM (SELECT *, (ll + lh + 1) // 2 AS lm, (rl + rh + 1) // 2 AS rm
         |        FROM $pfx${k - 1})))""".stripMargin
    }
    ((first +: stepCtes).mkString(",\n "), s"$pfx$steps")
  }

  /** [[RollingHash]] as a Column, no registry needed. */
  def rollHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RollingHash(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** [[PermHash]] as a Column. */
  def permHashCol(h: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PermHash(org.apache.spark.sql.graft.ColumnBridge.expression(h), i))

  /** [[CdcChunks]] as a Column. */
  def cdcChunksCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CdcChunks(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** [[CharEntropy]] as a Column. */
  def charEntropy(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CharEntropy(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Register `roll_hash` / `sim_hash` for `expr(...)` use. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "roll_hash", exprs => RollingHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sim_hash", exprs => SimHash(exprs.head), "scala_udf")
  }
}
