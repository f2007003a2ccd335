package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** u5_merge arithmetic: the op column must partition the output into
  * exactly the planted update/insert/keep sets, with deletes absent
  * and delete-beats-update on the 7∧13 conflict. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merge applies the planted delete/update/insert arithmetic exactly") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val out = Relational.queries("u5_merge")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val deleted = docs.filter(_ % 13 == 0).toSet
    val updated = docs.filter(i => i % 7 == 0 && i % 13 != 0).toSet
    // deletes vanish — including ids that ALSO matched the update rule
    assert(deleted.forall(!out.contains(_)), "a deleted id survived")
    updated.foreach(i => assert(out(i) == "update", s"$i: ${out(i)}"))
    assert(out.count(_._2 == "insert") == 20)
    out.filter(_._2 == "insert").keys.foreach(i => assert(i >= 1000000L))
    assert(out.count(_._2 == "keep") ==
      docs.length - deleted.size - updated.size)
    assert(out.size == docs.length - deleted.size + 20)
  }
}
