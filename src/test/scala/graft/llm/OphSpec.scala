package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dd_oph (one-permutation MinHash + rotation densification): the full
  * pipeline — bucket layout included — is hash-gated by the FNV-replay
  * twin; pinned here is the densification kernel against an
  * independent plain-Scala rotation, and that the sketch actually
  * finds near-dups on the corpus. */
class OphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("OphDensify matches an independent rotation replay; filled bins keep their min") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val mins = Dedup.shingleRows(docs)
      .select(col("doc_id"),
        shiftrightunsigned(graft.functions.TextHashes.rollHash(col("sh")), 1).as("u"))
      .withColumn("bin", (col("u") % 24).cast("int"))
      .groupBy("doc_id", "bin").agg(min(col("u")).as("mn"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).toMap).toMap
    val sigs = Dedup.ophSignatures(docs).collect()
    assert(sigs.nonEmpty)
    sigs.foreach { r =>
      val doc = r.getLong(0)
      val sig = r.getSeq[Long](1)
      assert(sig.length == 24)
      val m = mins(doc)
      (0 until 24).foreach { j =>
        val t = (0 until 24).find(t => m.contains((j + t) % 24)).get
        val expect = m((j + t) % 24) + t
        assert(sig(j) == expect, s"doc $doc bin $j: got ${sig(j)}, want $expect (t=$t)")
        if (m.contains(j)) assert(sig(j) == m(j), s"filled bin $j must keep its min")
      }
    }
  }

  test("the sketch pairs near-dups: emitted pairs exist and all verify >= 0.5") {
    val out = Dedup.queries("dd_oph")(spark, sf).collect()
    assert(out.nonEmpty, "gate cannot fail on an empty result (r3 lesson)")
    out.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }
}
