package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K7 — the data side of `animate_play` (optimal_pursuit.py:262-428).
  * Rendering (matplotlib/GIF) is out of engine scope (SURVEY §2.1 S5);
  * what IS in scope is the relation the renderer consumes: every
  * tracked entity's frames for a play, enriched with the players dim
  * and the u/v velocity components the quiver arrows draw
  * (optimal_pursuit.py:319-322), plus the per-play field bounds
  * (A8/X8 grid snap, optimal_pursuit.py:295-298).
  */
object Animate {

  /** Per-frame animation input: one row per (frame, entity). */
  def animationFrames(tracking: DataFrame, players: DataFrame): DataFrame = {
    val th = radians(col("dir"))
    tracking
      .join(broadcast(players.select("nflId", "displayName", "position")), Seq("nflId"), "left")
      .withColumn("u", col("s") * sin(th))
      .withColumn("v", col("s") * cos(th))
  }

  /** Field-of-view bounds per play, snapped to the 5-yard grid. */
  def fieldBounds(tracking: DataFrame): DataFrame =
    tracking.groupBy("gameId", "playId").agg(
      (floor(min(col("x")) / 5) * 5).cast("double").as("x_min"),
      (ceil(max(col("x")) / 5) * 5).cast("double").as("x_max"),
      (floor(min(col("y")) / 5) * 5).cast("double").as("y_min"),
      (ceil(max(col("y")) / 5) * 5).cast("double").as("y_max"))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "k7_animation_frames" -> ((s, _) =>
      animationFrames(DemoPlays.tracking(s), DemoPlays.players(s))
        .select("gameId", "playId", "nflId", "frameId", "x", "y", "u", "v",
          "displayName", "position")
        .orderBy("gameId", "playId", "frameId", "nflId")),
    "k7_field_bounds" -> ((s, _) =>
      fieldBounds(DemoPlays.tracking(s)).orderBy("gameId", "playId")))
}
