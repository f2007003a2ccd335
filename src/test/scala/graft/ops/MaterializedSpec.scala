package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** mv_refresh invariants beyond the oracle hash: refresh must equal a
  * full recompute (the MV contract), and it must actually be
  * incremental — proven by doctoring the stored partials and watching
  * the doctored value flow through to the refreshed output (a base
  * re-scan would erase it). Plus the tolerance as-of: the staleness
  * bound must both fire and preserve the fresh matches. */
class MaterializedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("mv_refresh equals a full recompute of base ∪ delta") {
    val refreshed = Materialized.queries("mv_refresh")(spark, sf)
    val full = graft.io.Sources.table(spark, sf, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(floor(col("value") * 1000000L).cast("long")) / 1000000.0, 4)
          .as("sum_value"),
        max(col("ts")).as("max_ts"))
      .orderBy("user_id", "event_type")
    assert(refreshed.collect().toSeq == full.collect().toSeq)
  }

  test("mv_refresh is incremental: a doctored stored partial reaches the output") {
    val path = s"/tmp/graft_mv_spec/pid_${ProcessHandle.current().pid()}"
    Materialized.mvBuild(spark, sf, path)
    val doctoredPath = path + "-doctored"
    // poison ONE stored partial: +1000 events on the lexicographically
    // first group
    val stored = spark.read.parquet(path)
    val first = stored.orderBy("user_id", "event_type").limit(1)
      .select("user_id", "event_type").collect().head
    stored.withColumn("n_events",
        when(col("user_id") === first.getLong(0) &&
          col("event_type") === first.getString(1),
          col("n_events") + 1000L).otherwise(col("n_events")))
      .write.mode("overwrite").parquet(doctoredPath)
    val clean = Materialized.refreshFrom(spark, sf, path).collect()
    val doctored = Materialized.refreshFrom(spark, sf, doctoredPath).collect()
    val diff = clean.zip(doctored).filter { case (a, b) => a != b }
    assert(diff.length == 1, "exactly the poisoned group must differ")
    val (c, dd) = diff.head
    assert(dd.getAs[Long]("n_events") == c.getAs[Long]("n_events") + 1000L,
      s"$c vs $dd — refresh must READ the stored MV, not recompute the base")
  }

  test("j7_asof_tol: the staleness bound fires and fresh matches agree with j7_asof") {
    val plain = graft.SparkEntry.queries("j7_asof")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_view_id"))).toMap
    val tol = graft.SparkEntry.queries("j7_asof_tol")(spark, sf).collect()
    assert(tol.nonEmpty)
    var nulledByTol = 0
    tol.foreach { r =>
      val id = r.getAs[Long]("event_id")
      val tolMatch = Option(r.getAs[java.lang.Long]("asof_view_id"))
      (plain(id), tolMatch) match {
        case (None, t) => assert(t.isEmpty, s"$id: no plain match but tol match")
        case (Some(p), Some(t)) => assert(p == t, s"$id: tol must keep the SAME winner")
        case (Some(_), None) => nulledByTol += 1 // stale winner nulled
      }
    }
    assert(nulledByTol > 0, "the 24h tolerance must null at least one stale match")
    assert(tol.exists(r => r.getAs[java.lang.Long]("asof_view_id") != null),
      "and at least one fresh match must survive")
  }
}
