package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dq_profile / dq_checks: single-pass plan shape and the
  * both-directions falsifiability the suite claims. */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dq_profile computes every column metric in one scan") {
    val df = Quality.queries("dq_profile")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("column", "n", "n_null", "n_distinct", "min_v", "max_v"))
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profile must be a single pass over lineitem:\n$p")
    assert(df.count() == 3)
  }

  test("dq_checks mixes genuine pass and fail rows on this corpus") {
    val rows = Quality.queries("dq_checks")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_violations"), r.getString(2))).toMap
    assert(rows.size == 5)
    // the synthetic lineitem's pk is non-unique and event values exceed
    // 100 — real failures, so zeroed-out counters can't fake a pass
    assert(rows("lineitem_pk_unique")._1 > 0 && rows("lineitem_pk_unique")._2 == "fail")
    assert(rows("events_value_in_0_100")._2 == "fail")
    assert(rows("orders_custkey_fk") == (0L, "pass"))
    assert(rows("events_ts_nonnull") == (0L, "pass"))
    assert(rows("documents_len_consistent") == (0L, "pass"))
  }

  test("dq_drift: full bin support, complete counts, no false alarm on hash halves") {
    val rows = Quality.queries("dq_drift")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L until 10L))
    val nDocs = graft.io.Sources.table(spark, sf, "documents").count()
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum == nDocs)
    // the two content-hash halves are draws from the SAME distribution:
    // total PSI must sit far below the 0.1 "significant shift" bar
    val psi = rows.map(r => math.abs(r.getAs[Long]("psi_micro"))).sum
    assert(psi < 100000L, s"PSI $psi micro-units on identically-distributed halves")
  }

  test("dq_dp_hist: real noise on every bin, Laplace-plausible spread, deterministic replay") {
    val run1 = Quality.queries("dq_dp_hist")(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("released_micro")).toMap
    assert(run1.keySet == (0L until 10L).toSet)
    // independently recompute the TRUE histogram and derive each bin's
    // noise; the double-FNV draw must produce genuinely varied Laplace
    // noise (the single-FNV first cut gave ten near-identical draws)
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val Array(mn, mx) = docs.selectExpr("min(n_chars)", "max(n_chars)")
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val truth = docs.selectExpr(s"((n_chars - $mn) * 10) div ($mx - $mn + 1) AS bin")
      .groupBy("bin").count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    val noises = (0L until 10L).map(b =>
      run1(b) / 1e6 - truth.getOrElse(b, 0L))
    assert(noises.forall(n => math.abs(n) > 1e-4), s"noiseless bin: $noises")
    assert(noises.map(math.abs).max > 1.0, s"implausibly tight noise: $noises")
    assert(noises.distinct.size == 10, s"repeated draws: $noises")
    assert(noises.exists(_ > 0) && noises.exists(_ < 0), s"one-sided noise: $noises")
    // Lap(1) noise beyond ±15 has probability ~3e-7 per draw
    assert(noises.forall(n => math.abs(n) < 15.0), s"outlandish noise: $noises")
    // a RECORDED seed means the release replays bit-identically
    val run2 = Quality.queries("dq_dp_hist")(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("released_micro")).toMap
    assert(run2 == run1)
  }

  test("dq_dp_geo: integer noise matching the exact inverse CDF, independently replayed") {
    val out = Quality.queries("dq_dp_geo")(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("released")).toMap
    assert(out.keySet == (0L until 10L).toSet)
    // independent truth + an independent plain-Scala replay of the
    // double-FNV draw and the α=1/2 two-sided geometric quantile
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val Array(mn, mx) = docs.selectExpr("min(n_chars)", "max(n_chars)")
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val truth = docs.selectExpr(s"((n_chars - $mn) * 10) div ($mx - $mn + 1) AS bin")
      .groupBy("bin").count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
      h
    }
    def geoNoise(b: Long): Long = {
      val v = java.lang.Math.floorMod(fnv(fnv(s"dpg-seed-$b").toString), 3145728L)
      if (v == 0L) -21L
      else if (v < 2097152L) (63 - java.lang.Long.numberOfLeadingZeros(v)) - 20L
      else if (v == 3145727L) 21L
      else 20L - (63 - java.lang.Long.numberOfLeadingZeros(3145727L - v))
    }
    val noises = (0L until 10L).map(b => out(b) - truth.getOrElse(b, 0L))
    (0L until 10L).foreach(b =>
      assert(noises(b.toInt) == geoNoise(b), s"bin $b: ${noises(b.toInt)} != ${geoNoise(b)}"))
    // two-sided geometric plausibility: P(Z=0)=1/3, so 10 draws with
    // NO zero has p=(2/3)^10≈1.7%; varied and bounded like Lap but
    // integer-exact — |Z|>21 is impossible by construction
    assert(noises.exists(_ != 0L) && noises.forall(n => math.abs(n) <= 21L))
    assert(noises.exists(_ > 0L) && noises.exists(_ < 0L), s"one-sided: $noises")
    // deterministic replay
    val run2 = Quality.queries("dq_dp_geo")(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("released")).toMap
    assert(run2 == out)
  }
}
