package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.{SparkSession, SaveMode}
import graft.pipelines.Yap

/** End-to-end throughput of the EP1/EP2 pipelines at season scale.
  *
  * Generates a deterministic synthetic season (default 11,400 tackle
  * plays — the reference's workload size, SURVEY §6): 60 frames/play at
  * 10 Hz, a ball carrier random-walking downfield and two tacklers
  * converging, positions drawn across the bounds ladder. Writes it as
  * parquet (so the pipelines pay real scan cost), then times
  * `Yap.run` (LQR kernel, groupByKey) and `MaxParams.run` (relational).
  *
  * The reference processes the same workload one play at a time,
  * re-reading all five CSVs per play (optimal_pursuit.py:132-149 inside
  * calculate_YAP.py:28's loop) — its structural cost is
  * O(plays × full-scan) before any numerics start.
  */
object YapScaleProbe {
  def main(args: Array[String]): Unit = {
    val nPlays = if (args.nonEmpty) args(0).toInt else 11400
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "512")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val positions = Vector("CB", "FS", "SS", "DE", "MLB", "OLB", "ILB", "DT", "NT", "DB")
    val dir = "/tmp/yap_scale"
    val t0Gen = System.nanoTime()
    val frames = spark.range(nPlays).flatMap { p =>
      val rnd = new scala.util.Random(42L + p) // deterministic per play
      val gameId = 1000L + p / 100
      val playId = p % 100
      val playDir = if (rnd.nextBoolean()) "left" else "right"
      val cx0 = 30.0 + rnd.nextDouble() * 40
      val cy0 = 10.0 + rnd.nextDouble() * 30
      val cvx = (if (playDir == "left") -1 else 1) * (2.0 + rnd.nextDouble() * 5)
      def ts(f: Int) = new Timestamp(1700000000000L + f * 100L)
      val carrier = (1 to 60).map { f =>
        val ev = f match {
          case 5 => "handoff"; case 55 => "tackle"; case _ => null
        }
        (gameId, playId, 100L, f, ts(f), playDir,
          cx0 + cvx * 0.1 * f, cy0 + rnd.nextGaussian() * 0.05,
          math.abs(cvx), 0.5, math.toDegrees(math.atan2(cvx, 0.0)), ev)
      }
      val tacklers = (0 until 2).flatMap { t =>
        val id = 200L + t
        val tx0 = cx0 + (rnd.nextDouble() - 0.3) * 12
        val ty0 = cy0 + (rnd.nextDouble() - 0.5) * 8
        (1 to 60).map { f =>
          // converge toward the carrier's current position
          val cx = cx0 + cvx * 0.1 * f
          val dx = cx - tx0; val dy = cy0 - ty0
          val d = math.hypot(dx, dy).max(0.1)
          val sp = 3.0 + rnd.nextDouble() * 3
          val x = tx0 + dx / d * sp * 0.1 * f
          val y = ty0 + dy / d * sp * 0.1 * f
          (gameId, playId, id, f, ts(f), playDir, x, y, sp, 0.8,
            math.toDegrees(math.atan2(dx / d, dy / d)), null: String)
        }
      }
      carrier ++ tacklers
    }.toDF("gameId", "playId", "nflId", "frameId", "time", "playDirection",
      "x", "y", "s", "a", "dir", "event")
    frames.write.mode(SaveMode.Overwrite).parquet(s"$dir/tracking.parquet")

    val plays = spark.range(nPlays)
      .selectExpr("1000 + id DIV 100 AS gameId", "id % 100 AS playId", "100L AS ballCarrierId")
    val players = ((100L, "Carrier", "RB") +:
      (0 until 2).map(t => (200L + t, s"Tackler$t", positions(t % positions.size))))
      .toDF("nflId", "displayName", "position")
    val tackles = spark.range(nPlays).flatMap(p =>
      Seq((1000L + p / 100, p % 100, 200L), (1000L + p / 100, p % 100, 201L)))
      .toDF("gameId", "playId", "nflId")
    println(f"generated $nPlays plays in ${(System.nanoTime() - t0Gen) / 1e9}%.1f s")

    val tracking = spark.read.parquet(s"$dir/tracking.parquet")
    // EP2 relational
    var t0 = System.nanoTime()
    val mpCount = graft.pipelines.MaxParams.run(spark, tracking, plays, players, tackles).count()
    val mpSec = (System.nanoTime() - t0) / 1e9
    println(f"EP2 max_params: $mpCount rows in $mpSec%.1f s (${nPlays / mpSec}%.0f plays/s)")
    // EP1 kernel
    t0 = System.nanoTime()
    val (yap, mpOpt, path, errs) = Yap.sinks(Yap.run(spark, tracking, plays, players, tackles))
    val yapCount = yap.count()
    val yapSec = (System.nanoTime() - t0) / 1e9
    val withYap = yap.filter(!yap("YAP").isNull).count()
    println(f"EP1 YAP: $yapCount tackler rows ($withYap with YAP) in $yapSec%.1f s (${nPlays / yapSec}%.0f plays/s)")
    println(f"errors: ${errs.count()}")
    spark.stop()
  }
}
