package graft.pipelines

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic distributed season generator (shared by the
  * `k4_yap_season` bench query and `tools.YapScaleProbe`): `nPlays`
  * tackle plays, 60 frames at 10 Hz, a carrier random-walking downfield
  * and two tacklers converging, positions drawn across the bounds
  * ladder. Generation is `spark.range`-based — each play is a pure
  * function of its index (seeded per play), so the data is identical
  * across runs and partitionings and no driver-side loop exists. */
object SyntheticSeason {

  val positions: Vector[String] =
    Vector("CB", "FS", "SS", "DE", "MLB", "OLB", "ILB", "DT", "NT", "DB")

  def tracking(spark: SparkSession, nPlays: Int): DataFrame = {
    import spark.implicits._
    spark.range(nPlays).flatMap { p =>
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
  }

  def plays(spark: SparkSession, nPlays: Int): DataFrame =
    spark.range(nPlays)
      .selectExpr("1000 + id DIV 100 AS gameId", "id % 100 AS playId", "100L AS ballCarrierId")

  def players(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ((100L, "Carrier", "RB") +:
      (0 until 2).map(t => (200L + t, s"Tackler$t", positions(t % positions.size))))
      .toDF("nflId", "displayName", "position")
  }

  def tackles(spark: SparkSession, nPlays: Int): DataFrame = {
    import spark.implicits._
    spark.range(nPlays).flatMap(p =>
      Seq((1000L + p / 100, p % 100, 200L), (1000L + p / 100, p % 100, 201L)))
      .toDF("gameId", "playId", "nflId")
  }
}
