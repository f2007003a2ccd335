package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Deletion-compliance sweep (dq_rtbf): the ledger bites on every
  * artifact, the written scrub really contains no deleted-doc rows,
  * the LIVE index is maintenance-not-rebuild untouched, and a re-run
  * is idempotent. */
class RtbfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val ledger = Dedup.queries("dq_rtbf")(spark, sf).collect()
  private lazy val idx = Dedup.ensureDedupIndexFor(spark, sf)

  test("the ledger bites: every artifact had rows to forget, and forgot them") {
    assert(ledger.map(_.getAs[String]("artifact")).sorted.sameElements(
      Array("chunks", "hashes", "signatures", "winnow")))
    ledger.foreach { r =>
      assert(r.getAs[Long]("n_touching_before") > 0,
        s"vacuous erasure on ${r.getAs[String]("artifact")}: $r")
      assert(r.getAs[Long]("n_touching_after") == 0, s"retention after scrub: $r")
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_touching_before"), r.toString)
    }
  }

  test("the written scrub carries no deleted doc ids") {
    ledger
    val del = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 20 === 5)
      .select("doc_id")
    Seq("hashes", "signatures", "winnow").foreach { name =>
      val n = spark.read.parquet(s"$idx/rtbf/$name")
        .join(del, Seq("doc_id"), "left_semi").count()
      assert(n == 0, s"$name scrub kept $n deleted-doc rows")
    }
  }

  test("maintenance, not rebuild: the live index is untouched") {
    val marker = new java.io.File(s"$idx/hashes/_SUCCESS")
    ledger
    val t0 = marker.lastModified
    Dedup.queries("dq_rtbf")(spark, sf).collect()
    assert(marker.lastModified == t0, "the sweep rewrote the live index")
  }

  test("idempotent: a second sweep reports the identical ledger") {
    val again = Dedup.queries("dq_rtbf")(spark, sf).collect()
    assert(again.map(_.toString).sorted.sameElements(
      ledger.map(_.toString).sorted))
  }
}
