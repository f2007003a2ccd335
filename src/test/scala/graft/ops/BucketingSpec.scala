package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bucketed join must plan without Exchange (the whole point). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two same-key bucketed tables is exchange-free") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    for (t <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(or, "b_orders", "l_orderkey", 8)
    // disable broadcast so the plan shows the bucketing property (at
    // this tiny SF AQE would rightly broadcast; at fact⋈fact scale
    // broadcast is off the table and bucketing is what saves the
    // shuffle — that is the case being demonstrated)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() ==
        li.join(or, Seq("l_orderkey")).count(), "result must equal the plain join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
