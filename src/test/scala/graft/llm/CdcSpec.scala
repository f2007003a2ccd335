package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** dd_cdc (mask-only content-defined chunking): the property the
  * primitive exists for — an edit near the front re-aligns within O(1)
  * chunks instead of shifting every boundary the way fixed-size blocks
  * do — plus exact conservation of the text under the chunk slicing. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent plain-Scala replay of the boundary rule + slicing:
    * the gear table regenerated from the splitmix64 constants, the
    * window hash computed DIRECTLY (non-rolling Σ gear·2^(7−k)) so a
    * bug in the kernel's O(1) rolling update cannot hide here. */
  private def chunks(text: String): Seq[String] = {
    def gear(b: Int): Long = {
      var z = b + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val n = text.length
    val cuts = (2 to n - 7).filter { i =>
      val h = (0 until 8).map(k => gear(text.charAt(i - 1 + k) & 0xff) << (7 - k)).sum
      (h >>> 60) == 0L
    }
    val starts = 1 +: cuts
    val ends = cuts :+ (n + 1)
    starts.zip(ends).map { case (s0, e0) => text.substring(s0 - 1, e0 - 1) }
  }

  test("chunk slicing conserves the text; engine matches the independent replay") {
    import spark.implicits._
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val out = Dedup.queries("dd_cdc")(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[String]("chunks_md5"))).toMap
    assert(out.size == docs.length)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (id, t) =>
      val cs = chunks(t)
      assert(cs.mkString("") == t, s"doc $id: chunks do not conserve the text")
      assert(out(id)._1 == cs.length.toLong, s"doc $id: chunk count")
      assert(out(id)._2 == md5hex(cs.map(md5hex).mkString(",")),
        s"doc $id: chunk digest")
    }
  }

  test("dd_cdc_incr: independent replay of the novel/known byte split") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val corpusCh = docs.filter(_._1 % 10 != 7).flatMap(d => chunks(d._2))
      .map(md5hex).toSet
    val out = Dedup.queries("dd_cdc_incr")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val batch = docs.filter(_._1 % 10 == 7)
    assert(out.size == batch.length)
    batch.foreach { case (id, t) =>
      val cs = chunks(t)
      val (dup, novel) = cs.partition(c => corpusCh(md5hex(c)))
      val r = out(id)
      assert(r.getAs[Long]("n_chunks") == cs.length.toLong, s"doc $id n_chunks")
      assert(r.getAs[Long]("n_novel") == novel.length.toLong, s"doc $id n_novel")
      assert(r.getAs[Long]("novel_chars") == novel.map(_.length.toLong).sum,
        s"doc $id novel_chars")
      assert(r.getAs[Long]("dup_chars") == dup.map(_.length.toLong).sum,
        s"doc $id dup_chars")
      // chunk slicing conserves the doc: the byte split must too
      assert(r.getAs[Long]("novel_chars") + r.getAs[Long]("dup_chars") == t.length.toLong)
    }
    // the gate is only meaningful if the corpus genuinely shares chunks
    // with the batch (the near-dup-rich generation guarantees it)
    assert(out.values.map(_.getAs[Long]("dup_chars")).sum > 0L,
      "no batch doc shares a single chunk with the corpus — gate is vacuous")
  }

  test("a front edit re-aligns within O(1) chunks (the CDC property)") {
    val t = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .orderBy(desc("n_chars")).select("text").head().getString(0)
    val a = chunks(t)
    val b = chunks("X" + t)
    assert(a.length >= 5, s"fixture doc too short for the test: ${a.length} chunks")
    // all chunks except a bounded prefix are IDENTICAL strings: the
    // mask re-synchronizes at the first boundary whose window no
    // longer overlaps the edit (within the first chunk + 7 cps)
    val shared = a.toSet.intersect(b.toSet).size
    assert(shared >= a.length - 2,
      s"front edit rewrote ${a.length - shared} of ${a.length} chunks — not content-defined")
    // and a FIXED-size chunking of the same width would share ~nothing:
    // every 16-cp block shifts by one
    val fixA = t.grouped(16).toSeq
    val fixB = ("X" + t).grouped(16).toSeq
    assert(fixA.toSet.intersect(fixB.toSet).size <= 1,
      "fixed-size baseline unexpectedly robust — test premise broken")
  }
}
