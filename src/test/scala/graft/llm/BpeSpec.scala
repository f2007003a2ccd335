package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BPE trainer/encoder invariants beyond the oracle hash: the argmax
  * sequence must be monotone, encoding must actually compress, and the
  * whole derivation must be partition-count independent (the argmax
  * tiebreak and integer counts leave no room for physical-plan
  * dependence — this pins it). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merge counts are non-increasing across rounds") {
    val merges = Bpe.queries("bpe_train")(spark, sf).collect()
    assert(merges.length == 10)
    val cnts = merges.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("cnt"))
    // merging only removes occurrences of other pairs, and a pair
    // created by round i has count <= the merged pair's count, so the
    // selected max can never rise
    cnts.sliding(2).foreach { case Array(a, b) => assert(a >= b, cnts.toSeq) }
    assert(cnts.last > 0)
  }

  test("encoding compresses: fewer BPE tokens than characters, at least one merge applied") {
    val enc = Bpe.queries("bpe_encode")(spark, sf)
    val base = graft.io.Sources.table(spark, sf, "documents")
      .select(col("doc_id"),
        aggregate(split(col("text"), " "), lit(0L),
          (acc, w) => acc + length(w)).as("n_char_tokens"))
    val joined = enc.join(base, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val bpe = r.getAs[Long]("n_tokens_bpe")
      val chars = r.getAs[Long]("n_char_tokens")
      assert(bpe <= chars, r.toString) // a token is >= 1 char
    }
    // corpus-wide, the 10 merges must have fired somewhere
    val totBpe = joined.map(_.getAs[Long]("n_tokens_bpe")).sum
    val totChar = joined.map(_.getAs[Long]("n_char_tokens")).sum
    assert(totBpe < totChar, s"$totBpe !< $totChar")
  }

  test("the learned merges are identical under a different partition count") {
    val a = Bpe.queries("bpe_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val scoped = graft.ops.ScopedSession(spark, "bpespec-p3",
      "spark.sql.shuffle.partitions" -> "3")
    val b = Bpe.queries("bpe_train")(scoped, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(a == b)
  }
}
