package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** J7 as-of join and the sk_topk heavy-hitter sketch: semantics vs an
  * independent brute force, and the plan shape that makes them viable at
  * scale (no nested-loop join; one shuffle). */
class AsofTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("j7_asof matches a brute-force latest-view-at-or-before scan") {
    val rows = graft.io.Sources.table(spark, sf, "events").collect()
    val views = rows.filter(_.getAs[String]("event_type") == "view")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    val clicks = rows.filter(_.getAs[String]("event_type") == "click")
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts")))
    val expected = clicks.map { case (cid, uid, cts) =>
      val prior = views.filter(v => v._1 == uid && !v._2.after(cts))
      val best = if (prior.isEmpty) None
        else Some(prior.maxBy(v => (v._2.getTime, v._3)))
      cid -> best.map(v => (v._3, v._4))
    }.toMap
    val got = Relational.queries("j7_asof")(spark, sf).collect().map { r =>
      r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_view_id"))) None
         else Some((r.getAs[Long]("asof_view_id"), r.getAs[Double]("asof_value"))))
    }.toMap
    assert(got.keySet == expected.keySet)
    assert(got == expected)
  }

  test("j7_asof plans one shuffle and no nested-loop join") {
    val p = Relational.queries("j7_asof")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of join must not plan a nested loop:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$p")
  }

  test("asofJoin resolves adversarial timestamp ties like the correlated form") {
    import spark.implicits._
    import java.sql.Timestamp
    // coarse timestamps (10 distinct values) over 200 events per trial:
    // heavy view-view and view-click ties in every run
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 200).map { i =>
        (i.toLong, (rnd.nextInt(5) + 1).toLong,
          new Timestamp(1700000000000L + rnd.nextInt(10) * 1000L),
          if (rnd.nextBoolean()) "view" else "click",
          rnd.nextDouble())
      }
      val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      val got = Relational.asofJoin(
        df.filter($"event_type" === "view").select($"user_id", $"ts",
          $"event_id".as("v_id"), $"value".as("v_value")),
        df.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          (if (r.isNullAt(r.fieldIndex("asof_view_id"))) None
           else Some(r.getAs[Long]("asof_view_id")))).toMap
      val views = rows.filter(_._4 == "view")
      val expected = rows.filter(_._4 == "click").map { case (cid, uid, cts, _, _) =>
        val prior = views.filter(v => v._2 == uid && !v._3.after(cts))
        cid -> (if (prior.isEmpty) None
                else Some(prior.maxBy(v => (v._3.getTime, v._1))._1))
      }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("custom as-of operator: identical to the union-window form on adversarial ties") {
    import spark.implicits._
    import java.sql.Timestamp
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 300).map { i =>
        (i.toLong, (rnd.nextInt(6) + 1).toLong,
          new Timestamp(1700000000000L + rnd.nextInt(8) * 1000L),
          if (rnd.nextBoolean()) "view" else "click",
          rnd.nextDouble())
      }
      val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      val views = df.filter($"event_type" === "view").select($"user_id", $"ts",
        $"event_id".as("v_id"), $"value".as("v_value"))
      val clicks = df.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("event_id"),
          if (r.isNullAt(r.fieldIndex("asof_view_id"))) -1L else r.getAs[Long]("asof_view_id"),
          if (r.isNullAt(r.fieldIndex("asof_value"))) Double.NaN else r.getAs[Double]("asof_value"))
      val window = Relational.asofJoin(views, clicks).collect().map(key).toSet
      val native = graft.plans.AsofJoin.join(views, clicks).collect().map(key).toSet
      assert(native == window, s"seed=$seed")
    }
  }

  test("custom as-of operator survives a single-user hot key across partitions") {
    import spark.implicits._
    import java.sql.Timestamp
    // 50k events, 90% on one user: the hot partition's merge must stay
    // O(1)-state correct and ties must still resolve deterministically
    val rnd = new scala.util.Random(5)
    val rows = (1 to 50000).map { i =>
      val user = if (rnd.nextInt(10) < 9) 7L else (rnd.nextInt(4) + 1).toLong
      (i.toLong, user, new Timestamp(1700000000000L + rnd.nextInt(1000) * 100L),
        if (rnd.nextBoolean()) "view" else "click", rnd.nextDouble())
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value").repartition(8)
    val views = df.filter($"event_type" === "view").select($"user_id", $"ts",
      $"event_id".as("v_id"), $"value".as("v_value"))
    val clicks = df.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts")
    val native = graft.plans.AsofJoin.join(views, clicks).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(3)) -1L else r.getAs[Long]("asof_view_id"))).toMap
    // brute force on the driver
    val vArr = rows.filter(_._4 == "view")
    val expected = rows.filter(_._4 == "click").map { case (cid, uid, cts, _, _) =>
      val prior = vArr.filter(v => v._2 == uid && !v._3.after(cts))
      cid -> (if (prior.isEmpty) -1L else prior.maxBy(v => (v._3.getTime, v._1))._1)
    }.toMap
    assert(native.size == expected.size)
    assert(native == expected)
  }

  test("custom as-of operator: null keys and null values match the union-window form") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Long) = new Timestamp(1700000000000L + m * 1000L)
    val views = Seq[(Option[Long], Option[Timestamp], Long, Option[Double])](
      (Some(1L), Some(t(1)), 10L, Some(5.0)),
      (Some(1L), Some(t(2)), 11L, None),          // null v_value, keyed
      (None, Some(t(1)), 12L, Some(7.0)),          // null user: never matches
      (Some(2L), None, 13L, Some(8.0)))            // null ts: never matches
      .toDF("user_id", "ts", "v_id", "v_value")
    val clicks = Seq[(Long, Option[Long], Option[Timestamp])](
      (100L, Some(1L), Some(t(3))),                // matches view 11 (null value)
      (101L, None, Some(t(3))),                    // null user → null enrichment
      (102L, Some(2L), Some(t(3))),                // only null-ts view → null
      (103L, Some(2L), None))                      // null ts → null
      .toDF("event_id", "user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getAs[Long]("event_id"),
        if (r.isNullAt(r.fieldIndex("asof_view_id"))) -1L else r.getAs[Long]("asof_view_id"),
        if (r.isNullAt(r.fieldIndex("asof_value"))) -999.0 else r.getAs[Double]("asof_value"))
    }.toSet
    val window = canon(Relational.asofJoin(views, clicks))
    val native = canon(graft.plans.AsofJoin.join(views, clicks))
    assert(native == window, s"native=$native window=$window")
    assert(native.contains((100L, 11L, -999.0))) // null value carried, not 0.0
    assert(native.contains((101L, -1L, -999.0)))
    // a non-time-backed ts column fails loudly instead of reading garbage
    val bad = clicks.withColumn("ts", org.apache.spark.sql.functions.lit("oops"))
    val err = intercept[IllegalArgumentException](
      graft.plans.AsofJoin.join(views, bad))
    assert(err.getMessage.contains("timestamp or long"))
    // MIXED time types fail loudly too (ADVICE r5): timestamp micros on
    // one side vs caller-defined long units on the other would compare
    // incomparable numbers by ordinal and silently mis-join
    val longClicks = clicks.withColumn("ts",
      org.apache.spark.sql.functions.col("ts").cast("long"))
    val err2 = intercept[IllegalArgumentException](
      graft.plans.AsofJoin.join(views, longClicks))
    assert(err2.getMessage.contains("SAME type"))
  }

  test("custom as-of operator plans AsofJoinExec with co-partitioned sorted children") {
    import org.apache.spark.sql.functions._
    val e = graft.io.Sources.table(spark, sf, "events")
    val df = graft.plans.AsofJoin.join(
      e.filter(col("event_type") === "view").select(col("user_id"), col("ts"),
        col("event_id").as("v_id"), col("value").as("v_value")),
      e.filter(col("event_type") === "click").select(col("event_id"),
        col("user_id"), col("ts")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"expected the custom operator:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"),
      s"native path must not fall back to the union-window encoding:\n$p")
  }

  test("j8_range matches the naive theta-join and plans no nested loop") {
    import org.apache.spark.sql.functions._
    val orders = graft.io.Sources.table(spark, sf, "orders")
    val li = graft.io.Sources.table(spark, sf, "lineitem")
    // naive reference: the BETWEEN theta-join Spark would plan as BNLJ
    val promos = orders.filter(col("o_orderkey") % 997 === 1)
      .select(col("o_orderkey").as("promo_id"),
        col("o_orderdate").cast("date").as("p_start"),
        date_add(col("o_orderdate").cast("date"), 29).as("p_end"))
    val naive = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_day"))
      .join(promos, col("ship_day").between(col("p_start"), col("p_end")))
      .select(col("l_orderkey"), col("l_linenumber"), col("promo_id"))
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2))).toSet
    val bucketized = Relational.queries("j8_range")(spark, sf)
      .collect().map(r => (r.getAs[Long]("l_orderkey"),
        r.getAs[Number]("l_linenumber").longValue, r.getAs[Long]("promo_id"))).toSet
    assert(bucketized == naive)
    assert(bucketized.nonEmpty)
    val p = Relational.queries("j8_range")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketized range join must plan an equi-join:\n$p")
  }

  test("j9_bloom_prune pushes a runtime bloom probe into the fact scan") {
    val df = Relational.queries("j9_bloom_prune")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"expected a runtime bloom probe on the fact side:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the modeled regime has no broadcastable side:\n$p")
    // scoped-session conf must not leak into the caller (r4 wrong §1 class)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }

  test("sk_topk surfaces the planted hot keys with bounded sketch error") {
    val out = Sketches.queries("sk_topk")(spark, sf).collect()
    val items = out.map(_.getAs[String]("item")).toSet
    // 3 planted hot keys at ~83 hits each vs ~5 per cold key: any sane
    // frequent-items sketch must surface all three in its top 10
    assert(Set("hot_0", "hot_1", "hot_2").subsetOf(items), s"items=$items")
    out.foreach { r =>
      // 64 tracked items over 1,000 rows: Misra-Gries-style error is
      // bounded by n/capacity ≈ 16; allow 3× slack for implementation
      // detail, which still falsifies a broken merge
      assert(math.abs(r.getAs[Long]("err_abs")) <= 50, r.toString)
    }
  }
}
