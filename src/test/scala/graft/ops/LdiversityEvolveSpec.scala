package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dq_ldiversity + s8_evolve: the value relations are hash-gated;
  * pinned here are the rule-consistency and can-this-gate-fail
  * properties (the dq_kanon spec discipline). */
class LdiversityEvolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("dq_ldiversity: rule consistent, both statuses live, domain-bounded") {
    val rows = Quality.queries("dq_ldiversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_sensitive")
      val status = r.getAs[String]("status")
      assert((ns < 3) == (status == "violating"), s"rule drift: $r")
      assert(ns >= 1 && ns <= r.getAs[Long]("n_users"),
        s"distinct sensitive outside [1, n_users]: $r")
      assert(ns <= 5, s"more sensitive values than event types: $r")
    }
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses == Set("ok", "violating"),
      s"gate cannot fail unless both statuses live on the corpus: $statuses")
    // the audit must MEASURE something dq_kanon doesn't: on this corpus
    // the two rules disagree on some group (here: small-but-diverse
    // groups — ok under l=3, violating under k=5; the homogeneity
    // direction (k-anonymous yet l-violating) does not occur on this
    // event distribution, which the 17/21 status split above makes a
    // checkable corpus fact rather than an untested assumption)
    assert(rows.exists(r => r.getAs[Long]("n_users") < 5 &&
      r.getAs[Long]("n_sensitive") >= 3),
      "l-diversity and k-anonymity agree on every group: the audit is redundant here")
  }

  test("s8_evolve: legacy/evolved split is exact; mergeSchema surfaces the new column") {
    val rows = graft.io.IoQueries.queries("s8_evolve")(spark, sf).collect()
    val docs = graft.io.Sources.table(spark, sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_even"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nEven) = docs(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n") == n, s"row lost in the merged read: $r")
      // gen-1 (even doc_id) rows must surface len_band as null — the
      // legacy count IS the even count
      assert(r.getAs[Long]("n_legacy") == nEven, s"null-fill drift: $r")
      // evolved rows contribute a real sum (bands are >= 1 for 100+ char docs)
      assert(r.getAs[Long]("band_sum") > 0, s"evolved column dropped: $r")
    }
  }
}
