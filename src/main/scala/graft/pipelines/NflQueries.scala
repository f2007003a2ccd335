package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract exposure of the NFL-domain pipelines (EP1/EP2).
  *
  * The testdata directory has no tracking tables, so these run on the
  * deterministic [[DemoPlays]] fixture (the sfDir argument is unused —
  * the fixture IS the input); they get the rows-only check plus the
  * hand-computed assertions in PipelinesSpec. The pipelines themselves
  * are input-agnostic: point `MaxParams.run`/`Yap.run` at real BDB
  * tables read via `graft.io.Sources` and the same plans execute.
  */
object NflQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dfs(s: SparkSession) = (
    DemoPlays.tracking(s), DemoPlays.plays(s),
    DemoPlays.players(s), DemoPlays.tackles(s))

  /** K5/EP2 — max pursuit params, pure relational. */
  private val k5MaxParams: Q = (s, _) => {
    val (tr, pl, py, tk) = dfs(s)
    MaxParams.run(s, tr, pl, py, tk).orderBy("game_ID", "play_ID", "NFL_ID")
  }

  /** K4/EP1 — YAP summary rows from the LQR kernel. */
  private val k4Yap: Q = (s, _) => {
    val (tr, pl, py, tk) = dfs(s)
    Yap.sinks(Yap.run(s, tr, pl, py, tk))._1.orderBy("game_ID", "play_ID", "NFL_ID")
  }

  /** K4/EP1 — optimal max-params (metrics over the optimal path). */
  private val k4MaxParamsOpt: Q = (s, _) => {
    val (tr, pl, py, tk) = dfs(s)
    Yap.sinks(Yap.run(s, tr, pl, py, tk))._2.orderBy("game_ID", "play_ID", "NFL_ID")
  }

  /** W7 — the spliced optimal-path frames. */
  private val k4Paths: Q = (s, _) => {
    val (tr, pl, py, tk) = dfs(s)
    Yap.sinks(Yap.run(s, tr, pl, py, tk))._3.orderBy("game_ID", "play_ID", "NFL_ID", "frameId")
  }

  /** S4 — the dead-letter relation. */
  private val k4DeadLetter: Q = (s, _) => {
    val (tr, pl, py, tk) = dfs(s)
    Yap.sinks(Yap.run(s, tr, pl, py, tk))._4.orderBy("game_ID", "play_ID", "NFL_ID")
  }

  val queries: Map[String, Q] = Map(
    "k5_max_params" -> k5MaxParams,
    "k4_yap" -> k4Yap,
    "k4_max_params_opt" -> k4MaxParamsOpt,
    "k4_opt_paths" -> k4Paths,
    "k4_deadletter" -> k4DeadLetter)
}
