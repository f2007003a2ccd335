package graft.tools

import org.apache.spark.sql.functions._

/** sk_setops error envelope (VERDICT r7 next §7): HLL
  * inclusion–exclusion |A∩B| = |A|+|B|−|A∪B| composes THREE ±2%
  * sketches, so its relative error explodes as the true intersection
  * shrinks — at |A∩B| ≪ |A∪B| the absolute sketch noise (~2% of the
  * union) dwarfs the quantity being estimated, and at |A∩B| = 0 the
  * estimate is pure noise with no defined relative error.
  *
  * This probe measures that envelope on a 10× user population (the
  * sf0.1 events users replicated with id offsets, the ScaleProbe
  * pattern) across three planted overlap regimes:
  *   dense    — A = uid%3∈{0,1}, B = uid%3∈{1,2}   (∩/∪ = 1/3)
  *   sparse   — A = uid%100<52,  B = uid%100≥48    (∩/∪ = 1/25)
  *   disjoint — A = uid%2=0,     B = uid%2=1       (∩ = 0)
  * printing estimated vs exact intersection and the relative error.
  * Results are recorded in BASELINE.md §sk_setops-envelope; the query
  * doc comment carries the one-line operating note. */
object SetopsEnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.io.Sources.table(spark, "/root/testdata/sf0.1", "events")
      .select(col("user_id")).distinct()
    val users = (0 until 10)
      .map(i => base.select((col("user_id") + lit(i * 1000000L)).as("uid")))
      .reduce(_ unionByName _).distinct().persist()
    val n = users.count()
    println(s"[setops-envelope] population $n distinct uids (10x sf0.1)")
    val regimes = Seq(
      ("dense", col("uid") % 3 < 2, col("uid") % 3 > 0),
      ("sparse", col("uid") % 100 < 52, col("uid") % 100 >= 48),
      ("disjoint", col("uid") % 2 === 0, col("uid") % 2 === 1))
    regimes.foreach { case (name, inA, inB) =>
      val est = users.agg(
          approx_count_distinct(when(inA, col("uid")), 0.02).as("n_a"),
          approx_count_distinct(when(inB, col("uid")), 0.02).as("n_b"),
          approx_count_distinct(when(inA || inB, col("uid")), 0.02).as("n_union"))
        .head
      val estInter = est.getLong(0) + est.getLong(1) - est.getLong(2)
      val exact = users.filter(inA).join(users.filter(inB), Seq("uid"), "left_semi").count()
      val relErr =
        if (exact == 0) Double.NaN
        else math.abs(estInter - exact).toDouble / exact
      println(f"[setops-envelope] $name%-9s n_a=${est.getLong(0)}%d " +
        f"n_b=${est.getLong(1)}%d n_union=${est.getLong(2)}%d " +
        f"est_inter=$estInter%d exact=$exact%d rel_err=$relErr%.4f")
    }
    spark.stop()
  }
}
