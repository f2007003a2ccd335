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
    // u/v rounded to 4 decimals: trig libm results differ ≤1 ulp across
    // engines, so raw sin/cos products can't hash-match the oracle
    tracking
      .join(broadcast(players.select("nflId", "displayName", "position")), Seq("nflId"), "left")
      .withColumn("u", graft.functions.Numeric.dround(col("s") * sin(th), 4))
      .withColumn("v", graft.functions.Numeric.dround(col("s") * cos(th), 4))
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

  /** DuckDB twins over the /tmp/graft_fixtures demo parquet (written by
    * Verify before the driver's compare runs). */
  val oracle: Map[String, String] = Map(
    "k7_animation_frames" ->
      """WITH tr AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_tracking/*.parquet')),
        | py AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_players/*.parquet'))
        |SELECT tr.gameId, tr.playId, tr.nflId, tr.frameId, tr.x, tr.y,
        | round(tr.s * sin(radians(tr.dir)), 4) AS u,
        | round(tr.s * cos(radians(tr.dir)), 4) AS v,
        | py.displayName, py.position
        |FROM tr LEFT JOIN py ON tr.nflId = py.nflId
        |ORDER BY tr.gameId, tr.playId, tr.frameId, tr.nflId""".stripMargin,
    "k7_field_bounds" ->
      """SELECT gameId, playId,
        | CAST(floor(min(x)/5)*5 AS DOUBLE) AS x_min,
        | CAST(ceil(max(x)/5)*5 AS DOUBLE) AS x_max,
        | CAST(floor(min(y)/5)*5 AS DOUBLE) AS y_min,
        | CAST(ceil(max(y)/5)*5 AS DOUBLE) AS y_max
        |FROM read_parquet('/tmp/graft_fixtures/demo_tracking/*.parquet')
        |GROUP BY gameId, playId ORDER BY gameId, playId""".stripMargin)
}
