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

  /** K4 at measurable scale — the flagship kernel over a 600-play
    * `SyntheticSeason` (the demo fixture is 3 plays; this puts real
    * kernel throughput into the bench: generate → one shuffle on
    * (gameId, playId) → LQR growing-horizon search per group). Rows-only
    * (kernel values are not SQL-expressible); the season generator is
    * deterministic, so the 1,200-row output is stable. */
  private val k4YapSeason: Q = (s, _) => {
    val n = 600
    Yap.sinks(Yap.run(s, SyntheticSeason.tracking(s, n), SyntheticSeason.plays(s, n),
      SyntheticSeason.players(s), SyntheticSeason.tackles(s, n)))._1
  }

  /** The same 600-play season through the EXCHANGE-FREE pre-bucketed
    * path (VERDICT r3 next-4 §7): the assembled frame relation is
    * written once per session as a table bucketed+sorted by the play
    * key (the warmup pass pays the build), and the timed query is the
    * bucketed read + partition-local kernel — no shuffle anywhere. The
    * delta vs `k4_yap_season` (generate + shuffle + kernel) is the
    * bench-visible cost of the Exchange the bucket layout removes. */
  private val k4YapSeasonBucketed: Q = (s, _) => {
    val n = 600
    val tbl = "graft_season_bucketed"
    if (!s.catalog.tableExists(tbl)) {
      // the in-memory catalog is session-scoped but the warehouse dir is
      // not: a previous JVM's table data would fail this session's
      // CREATE with LOCATION_ALREADY_EXISTS — clear the orphan first
      val loc = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (loc.exists) org.apache.commons.io.FileUtils.deleteDirectory(loc)
      Yap.materializeBucketed(s, SyntheticSeason.tracking(s, n), SyntheticSeason.plays(s, n),
        SyntheticSeason.players(s), SyntheticSeason.tackles(s, n), tbl, 32)
    }
    Yap.sinks(Yap.runBucketed(s, tbl))._1
  }

  val queries: Map[String, Q] = Map(
    "k5_max_params" -> k5MaxParams,
    "k4_yap" -> k4Yap,
    "k4_max_params_opt" -> k4MaxParamsOpt,
    "k4_opt_paths" -> k4Paths,
    "k4_deadletter" -> k4DeadLetter,
    "k4_yap_season" -> k4YapSeason,
    "k4_yap_season_bucketed" -> k4YapSeasonBucketed)

  /** DuckDB twin of the FULL EP2 pipeline over the demo-fixture parquet
    * that Verify dumps to /tmp/graft_fixtures (SURVEY §2.9 declares K5
    * SQL-expressible; this makes the claim checkable — the oracle
    * recomputes carrier extraction, boundaries, frame-aligned distance,
    * first crossing, and range max from the raw frames). The k4_*
    * queries stay rows-only: their values come from the LQR/RK45 kernel,
    * which SQL cannot express. */
  val oracle: Map[String, String] = Map(
    "k5_max_params" ->
      """WITH tr AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_tracking/*.parquet')),
        | pl AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_plays/*.parquet')),
        | py AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_players/*.parquet')),
        | tk AS (SELECT DISTINCT gameId, playId, nflId
        |        FROM read_parquet('/tmp/graft_fixtures/demo_tackles/*.parquet')),
        | carrier AS (
        |  SELECT t.gameId, t.playId, t.frameId, t.x AS xc, t.y AS yc, t.event
        |  FROM tr t JOIN pl p ON t.gameId = p.gameId AND t.playId = p.playId
        |   AND t.nflId = p.ballCarrierId),
        | boundaries AS (
        |  SELECT gameId, playId,
        |   coalesce(
        |    min(CASE WHEN event IN ('handoff','pass_outcome_caught','run','snap_direct') THEN frameId END),
        |    min(CASE WHEN event = 'ball_snap' THEN frameId END)) AS startFrame
        |  FROM carrier GROUP BY gameId, playId),
        | tf AS (
        |  SELECT t.gameId, t.playId, t.nflId, t.frameId, t.x, t.y, t.s, t.a
        |  FROM tr t JOIN tk k ON t.gameId = k.gameId AND t.playId = k.playId AND t.nflId = k.nflId),
        | dist AS (
        |  SELECT f.gameId, f.playId, f.nflId, f.frameId,
        |   sqrt((c.xc - f.x)*(c.xc - f.x) + (c.yc - f.y)*(c.yc - f.y)) AS dist
        |  FROM tf f JOIN carrier c
        |   ON f.gameId = c.gameId AND f.playId = c.playId AND f.frameId = c.frameId),
        | crossing AS (
        |  SELECT d.gameId, d.playId, d.nflId, min(d.frameId) AS vicFrame
        |  FROM dist d JOIN boundaries b ON d.gameId = b.gameId AND d.playId = b.playId
        |  WHERE d.dist < 1.0 AND d.frameId > b.startFrame
        |  GROUP BY d.gameId, d.playId, d.nflId),
        | ranges AS (
        |  SELECT f.gameId, f.playId, f.nflId, max(f.s) AS max_vel, max(f.a) AS max_accel
        |  FROM tf f JOIN boundaries b ON f.gameId = b.gameId AND f.playId = b.playId
        |   JOIN crossing c ON f.gameId = c.gameId AND f.playId = c.playId AND f.nflId = c.nflId
        |  WHERE f.frameId >= b.startFrame AND f.frameId < c.vicFrame
        |  GROUP BY f.gameId, f.playId, f.nflId)
        |SELECT k.gameId AS game_ID, k.playId AS play_ID, k.nflId AS NFL_ID,
        | py.displayName AS name, py.position, r.max_vel, r.max_accel
        |FROM tk k
        |LEFT JOIN py ON k.nflId = py.nflId
        |LEFT JOIN ranges r ON k.gameId = r.gameId AND k.playId = r.playId AND k.nflId = r.nflId
        |ORDER BY game_ID, play_ID, NFL_ID""".stripMargin,
    // the K4 kernel's dead-letter branch is relational over the fixture:
    // a tackler whose position is outside the bounds ladder, or a play
    // with no start/stop event on the carrier series, produces exactly
    // these error rows (Yap.processPlay; optimal_pursuit.py:458-477 has
    // no else branch)
    "k4_deadletter" ->
      """WITH tr AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_tracking/*.parquet')),
        | pl AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_plays/*.parquet')),
        | py AS (SELECT * FROM read_parquet('/tmp/graft_fixtures/demo_players/*.parquet')),
        | tk AS (SELECT DISTINCT gameId, playId, nflId
        |        FROM read_parquet('/tmp/graft_fixtures/demo_tackles/*.parquet')),
        | carrier AS (
        |  SELECT t.gameId, t.playId, t.event
        |  FROM tr t JOIN pl p ON t.gameId = p.gameId AND t.playId = p.playId
        |   AND t.nflId = p.ballCarrierId),
        | playflags AS (
        |  SELECT gameId, playId,
        |   max(CASE WHEN event IN ('handoff','pass_outcome_caught','run','snap_direct','ball_snap')
        |       THEN 1 ELSE 0 END) AS has_start,
        |   max(CASE WHEN event IN ('tackle','out_of_bounds','fumble','qb_slide',
        |       'touchdown','safety','fumble_defense_recovered') THEN 1 ELSE 0 END) AS has_stop
        |  FROM carrier GROUP BY gameId, playId)
        |SELECT game_ID, play_ID, NFL_ID, error FROM (
        | SELECT f.gameId AS game_ID, f.playId AS play_ID, CAST(-1 AS BIGINT) AS NFL_ID,
        |  'no start event' AS error FROM playflags f WHERE f.has_start = 0
        | UNION ALL
        | SELECT f.gameId, f.playId, CAST(-1 AS BIGINT), 'no stop event'
        | FROM playflags f WHERE f.has_start = 1 AND f.has_stop = 0
        | UNION ALL
        | SELECT k.gameId, k.playId, k.nflId,
        |  'unknown tackler position ''' || coalesce(py.position, '') || ''''
        | FROM tk k JOIN playflags f ON k.gameId = f.gameId AND k.playId = f.playId
        | LEFT JOIN py ON k.nflId = py.nflId
        | WHERE f.has_start = 1 AND f.has_stop = 1
        |  AND coalesce(py.position, '')
        |      NOT IN ('CB','FS','SS','DB','DE','MLB','OLB','ILB','DT','NT'))
        |ORDER BY game_ID, play_ID, NFL_ID""".stripMargin)
}
