package graft.pipelines

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic BDB-shaped plays (SURVEY §5: no real Kaggle
  * data ships in this environment, so the EP1/EP2 pipelines are driven —
  * by both the driver contract and the test suites — on constructed
  * plays with hand-computable expectations).
  *
  * Play 1001: stationary carrier at (50,25); DB tackler 201 approaches
  *   from (58,25) at 4 yd/s (speed 4.0, accel 0.5 on every frame).
  *   handoff at frame 5, tackle at frame 45. Vicinity: first frame with
  *   dist < 1 after frame 5 → frame 19 (x = 58 − 0.4·18 = 50.8).
  *   Expected max_vel over frames [5,19) = 4.0, max_accel = 0.5.
  * Play 1002: carrier sprints right at 9 yd/s; DT tackler 202 starts
  *   10 yd behind at 3 yd/s — never within R_t → null metrics, null YAP.
  * Play 1003: tackler 203 has unknown position 'QB' → dead-letter.
  */
object DemoPlays {
  val dt = 0.1
  private val t0Ms = 1700000000000L

  case class Tr(gameId: Long, playId: Long, nflId: Long, frameId: Int,
      time: Timestamp, club: String, playDirection: String,
      x: Double, y: Double, s: Double, a: Double, dis: Double,
      o: Double, dir: Double, event: Option[String])

  private def ts(frame: Int) = new Timestamp(t0Ms + (frame * 100L))

  private def ev(frame: Int): Option[String] = frame match {
    case 5 => Some("handoff")
    case 45 => Some("tackle")
    case _ => None
  }

  def frames(): Seq[Tr] = {
    val p1Carrier = (1 to 50).map { f =>
      Tr(1L, 1001L, 100L, f, ts(f), "AAA", "left", 50.0, 25.0, 0.0, 0.0, 0.0, 0.0, 0.0, ev(f))
    }
    // dir: moving −x ⇒ u=−s, v=0 ⇒ dir = atan2(u,v) = −90°
    val p1Tackler = (1 to 50).map { f =>
      Tr(1L, 1001L, 201L, f, ts(f), "BBB", "left",
        58.0 - 0.4 * (f - 1), 25.0, 4.0, 0.5, 0.4, 0.0, -90.0, None)
    }
    val p2Carrier = (1 to 50).map { f =>
      Tr(1L, 1002L, 100L, f, ts(f), "AAA", "right",
        30.0 + 0.9 * (f - 1), 25.0, 9.0, 0.0, 0.9, 0.0, 90.0, ev(f))
    }
    val p2Tackler = (1 to 50).map { f =>
      Tr(1L, 1002L, 202L, f, ts(f), "BBB", "right",
        20.0 + 0.3 * (f - 1), 25.0, 3.0, 0.2, 0.3, 0.0, 90.0, None)
    }
    val p3Carrier = (1 to 50).map { f =>
      Tr(1L, 1003L, 100L, f, ts(f), "AAA", "left", 50.0, 25.0, 0.0, 0.0, 0.0, 0.0, 0.0, ev(f))
    }
    val p3Tackler = (1 to 50).map { f =>
      Tr(1L, 1003L, 203L, f, ts(f), "BBB", "left", 52.0, 25.0, 1.0, 0.1, 0.1, 0.0, -90.0, None)
    }
    p1Carrier ++ p1Tackler ++ p2Carrier ++ p2Tackler ++ p3Carrier ++ p3Tackler
  }

  def tracking(spark: SparkSession): DataFrame = {
    import spark.implicits._
    frames().toDF()
  }

  def plays(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, 1001L, 100L), (1L, 1002L, 100L), (1L, 1003L, 100L))
      .toDF("gameId", "playId", "ballCarrierId")
  }

  def players(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((100L, "Carrier One", "RB"), (201L, "Tackler DB", "CB"),
      (202L, "Tackler DT", "DT"), (203L, "Odd Position", "QB"))
      .toDF("nflId", "displayName", "position")
  }

  def tackles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, 1001L, 201L), (1L, 1002L, 202L), (1L, 1003L, 203L))
      .toDF("gameId", "playId", "nflId")
  }
}
