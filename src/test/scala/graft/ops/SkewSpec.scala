package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Salted join/agg must be result-identical to the plain forms. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def skewed = {
    import spark.implicits._
    // 90% of rows share one key — the classic hot-key shape
    (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong, i * 0.5))
      .toDF("k", "id", "v")
  }

  private def dim = {
    import spark.implicits._
    (0L to 6L).map(k => (k, s"name_$k")).toDF("k", "k_name")
  }

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "id", "v", "k_name")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8, saltFrom = Seq("id"))
      .select("k", "id", "v", "k_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedSum equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (math.rint(r.getDouble(1) * 100), r.getLong(2)))).toMap
    val salted = Skew.saltedSum(skewed, "k", "v", salts = 8, saltFrom = Seq("id"))
      .collect().map(r => (r.getLong(0), (math.rint(r.getDouble(1) * 100), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("salt is deterministic across runs") {
    val a = skewed.select(Skew.saltCol(8, col("id"))).collect().map(_.getInt(0)).toSeq
    val b = skewed.select(Skew.saltCol(8, col("id"))).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(a.distinct.size == 8) // all salt values used
  }

  test("driver query sk_salted_join really joins on the salted key") {
    // the oracle twin certifies result identity with the plain join;
    // this pins that the salted exchange actually happens — otherwise
    // the query silently degenerates into an unsalted gate
    val df = Skew.queries("sk_salted_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salted key in plan:\n$plan")
    assert(df.count() == 25) // one row per nation
  }

  test("driver query sk_salted_agg two-phase plan carries the salt") {
    val df = Skew.queries("sk_salted_agg")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salted key in plan:\n$plan")
  }
}
