package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The sf0.01 driver gate runs at tiny cardinalities where HLL++ is
  * near-exact; these tests plant cardinalities large enough for the
  * approximation to be real and assert the documented error bounds. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct holds its rsd at 100k distinct keys") {
    import spark.implicits._
    val n = 100000
    val est = (1 to n).toDF("id").repartition(8)
      .agg(approx_count_distinct(col("id"), 0.02).as("est"))
      .head().getLong(0)
    // rsd 0.02 → 3-sigma band 6%
    assert(math.abs(est - n).toDouble / n < 0.06, s"est=$est")
  }

  test("approx_percentile rank error bounded by 1/accuracy") {
    import spark.implicits._
    val n = 50000
    val est = (1 to n).toDF("v")
      .agg(percentile_approx(col("v"), lit(0.9), lit(1000)).as("p90"))
      .head().getInt(0)
    // accuracy 1000 → rank error ≤ n/1000 = 50 ranks
    assert(math.abs(est - 45000) <= 60, s"p90=$est")
  }

  test("count-min sketch only overestimates, and genuinely collides at w=64") {
    // sf0.01, not the usual sf0.001: the gate SF's 153 live keys in 64
    // cells make collisions certain; 18 keys at sf0.001 collide nowhere
    val rows = Sketches.queries("sk_cms")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    // CMS point estimates are min-over-cells of colliding counters:
    // est >= exact always; with ~153 live keys in 64 cells per row,
    // some key must carry a real collision (all-zero error would mean
    // the demonstration is vacuous — a wider-than-keyspace sketch)
    rows.foreach(r => assert(r.getAs[Long]("err_abs") >= 0L, r.toString))
    assert(rows.map(_.getAs[Long]("err_abs")).sum > 0L, "no collisions at w=64?")
    // the planted hot keys must remain identifiable through the sketch:
    // every hot estimate dominates every cold key's exact count
    val hotEst = rows.filter(_.getAs[String]("item").startsWith("hot_"))
      .map(_.getAs[Long]("n_est"))
    val coldExactMax = rows.filter(!_.getAs[String]("item").startsWith("hot_"))
      .map(_.getAs[Long]("n_exact")).max
    assert(hotEst.forall(_ > coldExactMax))
  }

  test("sketch queries agree with exact at gate scale") {
    val hll = Sketches.queries("sk_hll")(spark, "/root/testdata/sf0.001").collect()
    assert(hll.nonEmpty)
    // 150-user cardinalities: rsd-2% HLL must land within 5% everywhere
    hll.foreach(r => assert(r.getAs[Double]("err_rel") <= 0.05, r.toString))
    val q = Sketches.queries("sk_quantile")(spark, "/root/testdata/sf0.001").collect()
    q.foreach { r =>
      assert(r.getAs[Double]("p50_err") <= 0.01, r.toString)
      assert(r.getAs[Double]("p95_err") <= 0.01, r.toString)
    }
  }

  test("HLL inclusion-exclusion lands within the compounded sketch error") {
    val r = Sketches.queries("sk_setops")(spark, "/root/testdata/sf0.001").head
    val exact = r.getAs[Long]("x_inter")
    assert(exact > 0, "corpus should have a click∩purchase audience")
    // three 2%-rsd sketches compound through the subtraction; 15% is a
    // loose falsifiable ceiling at these cardinalities
    assert(r.getAs[Double]("err_rel") <= 0.15, r.toString)
    // union can never exceed |A| + |B|, and the estimate is integral
    assert(r.getAs[Long]("n_union") <= r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
  }
}
