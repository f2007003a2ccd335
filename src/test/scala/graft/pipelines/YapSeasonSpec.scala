package graft.pipelines

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end regression net for the K4 YAP kernel at a row count where
  * branch coverage is structural, not hand-picked (VERDICT r2 §next 6):
  * a 200-play randomized synthetic season with four interleaved
  * archetypes — feasible pursuit, infeasible-vicinity fallback,
  * never-in-vicinity nulls, and dead-letter plays (unknown position /
  * missing event boundaries) — driven through the REAL Spark pipeline
  * (`Yap.run`), then pinned against an independent evaluation:
  *
  *  - boundaries / vicinity / YAP bookkeeping recomputed directly from
  *    the raw frames with straight-line test code;
  *  - the LQR feasibility search re-solved with an INDEPENDENT
  *    fixed-step classical RK4 integrator written here from the
  *    published math (backward Riccati sweep + state/costate system,
  *    optimal_pursuit.py:22-53 semantics) — no call into
  *    graft.kernel.OptimalPursuit.
  *
  * Agreement contract: with the same first-feasible horizon j the YAP
  * value is EXACTLY ±(xC(j) − xC(vic)) in both evaluations, so the
  * integrators only influence the feasibility decision. Plays where any
  * feasibility gate sits within 0.03 of its bound (the combined
  * integration-error band of the two solvers) are counted as borderline
  * and excluded
  * from the strict compare; everything else must match within ±0.01 —
  * the reference's own rounding tolerance (optimal_pursuit.py:560).
  */
object YapSeasonSpec {
  /** Top-level (encoder-reachable) tracking-frame row. */
  final case class Fr(gameId: Long, playId: Long, nflId: Long, frameId: Int,
      time: Timestamp, club: String, playDirection: String,
      x: Double, y: Double, s: Double, a: Double, dis: Double,
      o: Double, dir: Double, event: Option[String])
}

class YapSeasonSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val nPlays = 200
  private val nFrames = 60
  private val rT = 1.0
  private val dt = 0.1
  private val t0Ms = 1700000000000L

  // archetype by play index: 0-1 dead-letter position, 2 no-start,
  // 3 no-stop, 4-5 fallback (vicinity reached, optimal infeasible),
  // 6-7 never-in-vicinity, else converging pursuit
  private def archetype(p: Int): String = p % 20 match {
    case 0 | 1 => "deadpos"
    case 2     => "nostart"
    case 3     => "nostop"
    case 4 | 5 => "fallback"
    case 6 | 7 => "far"
    case _     => "pursuit"
  }

  import YapSeasonSpec.Fr

  private def ts(f: Int) = new Timestamp(t0Ms + f * 100L)

  /** One play's frames: carrier (nflId 100) + one tackler (nflId 200). */
  private def playFrames(p: Int): Seq[Fr] = {
    val rnd = new scala.util.Random(9000L + p)
    val kind = archetype(p)
    val gameId = 1L + p / 100
    val playId = (p % 100).toLong
    val playDir = if (rnd.nextBoolean()) "left" else "right"
    val sign = if (playDir == "left") -1.0 else 1.0
    val cx0 = 40.0 + rnd.nextDouble() * 30
    val cy0 = 15.0 + rnd.nextDouble() * 20
    val cv = 2.0 + rnd.nextDouble() * 5
    def cx(f: Int) = cx0 + sign * cv * dt * (f - 1)
    val carrierDir = math.toDegrees(math.atan2(sign * cv, 0.0))
    def ev(f: Int): Option[String] = f match {
      case 5 if kind != "nostart" => Some("handoff")
      case 55 if kind != "nostop" => Some("tackle")
      case _ => None
    }
    val carrier = (1 to nFrames).map { f =>
      Fr(gameId, playId, 100L, f, ts(f), "AAA", playDir,
        cx(f), cy0, cv, 0.0, cv * dt, 0.0, carrierDir, ev(f))
    }
    val tackler = kind match {
      case "far" =>
        // parallel track 12 yd away: never within rT, no fallback either
        (1 to nFrames).map { f =>
          Fr(gameId, playId, 200L, f, ts(f), "BBB", playDir,
            cx(f), cy0 + 12.0, 2.0, 0.5, 0.2, 0.0, carrierDir, None)
        }
      case "fallback" =>
        // actual frames jump into the vicinity at frame 40, but the
        // tackler's START position is 80 yd off — no LQR horizon passes
        // the DT speed gate (8.8 yd/s), so the kernel must fall back to
        // range-max over the ACTUAL frames: max s = 3.0, max a = 1.0
        (1 to nFrames).map { f =>
          val (x, y) = if (f < 40) (cx0 + 80.0, cy0 + 5.0) else (cx(f) + 0.5, cy0)
          Fr(gameId, playId, 200L, f, ts(f), "BBB", playDir,
            x, y, 3.0, 1.0, 0.3, 0.0, carrierDir, None)
        }
      case _ =>
        // pursuit / dead-letter archetypes: converge on the carrier
        val tx0 = cx0 + (rnd.nextDouble() - 0.3) * 10
        val ty0 = cy0 + (rnd.nextDouble() - 0.5) * 8
        val sp = 3.0 + rnd.nextDouble() * 3
        (1 to nFrames).map { f =>
          val dx = cx(f) - tx0
          val dy = cy0 - ty0
          val d = math.max(math.hypot(dx, dy), 0.1)
          val x = tx0 + dx / d * sp * dt * f
          val y = ty0 + dy / d * sp * dt * f
          Fr(gameId, playId, 200L, f, ts(f), "BBB", playDir,
            x, y, sp, 0.8, sp * dt, 0.0,
            math.toDegrees(math.atan2(dx / d, dy / d)), None)
        }
    }
    carrier ++ tackler
  }

  private def position(p: Int): String = archetype(p) match {
    case "deadpos"  => "QB" // not in the bounds ladder → dead letter
    case "fallback" => "DT" // lowest speed gate in the ladder
    case _          => Seq("CB", "FS", "MLB", "OLB")(p % 4)
  }

  // ---------------------------------------------------------------
  // independent fixed-step classical RK4 LQR solver (test-local)
  // ---------------------------------------------------------------

  private def mm(a: Array[Array[Double]], b: Array[Array[Double]]) =
    Array.tabulate(4, 4)((i, j) => (0 until 4).map(k => a(i)(k) * b(k)(j)).sum)
  private def tr(a: Array[Array[Double]]) = Array.tabulate(4, 4)((i, j) => a(j)(i))

  private val Fm = Array(
    Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0),
    Array(0.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0, 0.0))

  /** Backward sweep then forward state/costate pass, both fixed-step
    * classical RK4 (h ≈ 1e-3), sampled at the grid `t`. Returns
    * (x, y, u, v, ax, ay) arrays. */
  private def fineSolve(x0: Double, y0: Double, u0: Double, v0: Double,
      t: Array[Double], vMax: Double, aMax: Double): (Array[Double], Array[Double],
      Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val cR = 2.0 / (rT * rT)
    val beta = 2.0 / (aMax * aMax)
    val alpha = 2.0 / (vMax * vMax)
    val m = 1.0 / beta // G B⁻¹ Gᵀ = diag(0,0,m,m)
    val tF = t.last
    val Am = Array(
      Array(0.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, alpha, 0.0), Array(0.0, 0.0, 0.0, alpha))

    // dS/dτ = S F + Fᵀ S + A − S M S (τ = time-to-go), S(0) = Sf
    def sDot(s: Array[Array[Double]]): Array[Array[Double]] = {
      val sf = mm(s, Fm)
      val Mm = Array(
        Array(0.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0, 0.0),
        Array(0.0, 0.0, m, 0.0), Array(0.0, 0.0, 0.0, m))
      val sms = mm(mm(s, Mm), s)
      Array.tabulate(4, 4)((i, j) => sf(i)(j) + tr(sf)(i)(j) + Am(i)(j) - sms(i)(j))
    }
    def addS(a: Array[Array[Double]], b: Array[Array[Double]], w: Double) =
      Array.tabulate(4, 4)((i, j) => a(i)(j) + w * b(i)(j))

    var s = Array.tabulate(4, 4)((i, j) =>
      if (i == j && i < 2) cR else 0.0)
    val nSteps = math.max(1, math.ceil(tF / 1e-3).toInt)
    val h = tF / nSteps
    var k = 0
    while (k < nSteps) {
      val k1 = sDot(s)
      val k2 = sDot(addS(s, k1, h / 2))
      val k3 = sDot(addS(s, k2, h / 2))
      val k4 = sDot(addS(s, k3, h))
      s = Array.tabulate(4, 4)((i, j) =>
        s(i)(j) + h / 6 * (k1(i)(j) + 2 * k2(i)(j) + 2 * k3(i)(j) + k4(i)(j)))
      k += 1
    }

    // forward: ẋ = F x − M λ ; λ̇ = −A x − Fᵀ λ
    def yDot(y: Array[Double]): Array[Double] = Array(
      y(2), y(3), -m * y(6), -m * y(7),
      0.0, 0.0, -alpha * y(2) - y(4), -alpha * y(3) - y(5))
    def addV(a: Array[Double], b: Array[Double], w: Double) =
      Array.tabulate(8)(i => a(i) + w * b(i))

    val xv = Array(x0, y0, u0, v0)
    val l0 = Array.tabulate(4)(i => (0 until 4).map(j => s(i)(j) * xv(j)).sum)
    var y = xv ++ l0
    val n = t.length
    val (xs, ys, us, vs, axs, ays) = (new Array[Double](n), new Array[Double](n),
      new Array[Double](n), new Array[Double](n), new Array[Double](n), new Array[Double](n))
    var i = 0
    var tCur = 0.0
    while (i < n) {
      val seg = t(i) - tCur
      if (seg > 0) {
        val steps = math.max(1, math.ceil(seg / 1e-3).toInt)
        val hh = seg / steps
        var q = 0
        while (q < steps) {
          val k1 = yDot(y)
          val k2 = yDot(addV(y, k1, hh / 2))
          val k3 = yDot(addV(y, k2, hh / 2))
          val k4 = yDot(addV(y, k3, hh))
          y = Array.tabulate(8)(d =>
            y(d) + hh / 6 * (k1(d) + 2 * k2(d) + 2 * k3(d) + k4(d)))
          q += 1
        }
        tCur = t(i)
      }
      xs(i) = y(0); ys(i) = y(1); us(i) = y(2); vs(i) = y(3)
      axs(i) = -y(6) / beta; ays(i) = -y(7) / beta
      i += 1
    }
    (xs, ys, us, vs, axs, ays)
  }

  private def round2(v: Double) = math.rint(v * 100.0) / 100.0

  /** Combined integration-error band of the two solvers: the engine's
    * RK45 runs at rtol 1e-3, so gate values of magnitude ~10 carry up
    * to ~1e-2 absolute error — inside that band the feasibility
    * decision may legitimately flip between integrators. */
  private val gateBand = 0.03

  /** Per-horizon independent evaluation of one play. Returns the first
    * feasible horizon (absolute carrier index) and its YAP, plus a
    * per-horizon borderline flag (any feasibility gate within
    * [[gateBand]] of its bound). Horizons are evaluated until the first
    * feasible one or `alsoEval` (the ENGINE's chosen horizon), whichever
    * is later — so a horizon dispute can always be attributed. Pruned
    * horizons ((dist−rT)/tF > vMax) need no flag: the prune is the
    * identical double expression in both evaluations, not an
    * integrator result. */
  private def independentEval(p: Int, alsoEval: Option[Int])
      : (Option[Int], Option[Double], Map[Int, Boolean]) = {
    val frames = playFrames(p)
    val carrier = frames.filter(_.nflId == 100L).sortBy(_.frameId).toArray
    val tackler = frames.filter(_.nflId == 200L).sortBy(_.frameId).toArray
    val bounds = Map(
      "CB" -> (5.6, 10.9, 4.2, 9.1), "FS" -> (5.6, 10.9, 4.2, 9.1),
      "MLB" -> (5.0, 10.7, 3.9, 9.4), "OLB" -> (5.0, 10.7, 3.9, 9.4),
      "DT" -> (3.2, 8.8, 2.4, 7.1))
    val (vMed, vMax, aMed, aMax) = bounds(position(p))
    val idxStart = carrier.indexWhere(_.event.contains("handoff"))
    require(idxStart >= 0)
    val timeRel = carrier.map(f => (f.time.getTime - t0Ms) / 1000.0)
    val time0 = timeRel(idxStart)
    val xC = carrier.map(_.x)
    val yC = carrier.map(_.y)
    var idxVic = -1
    var i = idxStart + 1
    while (i < carrier.length && idxVic < 0) {
      val d = math.hypot(xC(i) - tackler(i).x, yC(i) - tackler(i).y)
      if (d < rT) idxVic = i
      i += 1
    }
    if (idxVic < 0) return (None, None, Map.empty)
    val start = tackler(idxStart)
    val u0 = start.s * math.sin(math.toRadians(start.dir))
    val v0 = start.s * math.cos(math.toRadians(start.dir))
    var jFeas: Option[Int] = None
    var yap: Option[Double] = None
    val border = scala.collection.mutable.Map.empty[Int, Boolean]
    var j = idxStart + 1
    while (j <= carrier.length - 2 && (jFeas.isEmpty || alsoEval.exists(_ >= j))) {
      val tj = timeRel.slice(idxStart, j + 1).map(_ - time0)
      val distJ = math.hypot(start.x - xC(j), start.y - yC(j))
      val tF = tj.last
      if (!(tF <= 0.0 || (distJ - rT) / tF > vMax)) {
        val (xs, ys, us, vs, axs, ays) =
          fineSolve(start.x - xC(j), start.y - yC(j), u0, v0, tj, vMed, aMed)
        val finalR = math.hypot(xs.last, ys.last)
        val mSpd = us.indices.map(k => math.hypot(us(k), vs(k))).max
        val mAcc = axs.indices.map(k => math.hypot(axs(k), ays(k))).max
        border(j) = math.abs(finalR - rT) < gateBand ||
          math.abs(mSpd - vMax) < gateBand || math.abs(mAcc - aMax) < gateBand
        if (jFeas.isEmpty && finalR <= rT && mSpd <= vMax && mAcc <= aMax) {
          jFeas = Some(j)
          val playDir = carrier.head.playDirection
          yap = Some(round2(
            if (playDir == "left") xC(j) - xC(idxVic) else xC(idxVic) - xC(j)))
        }
      }
      j += 1
    }
    (jFeas, yap, border.toMap)
  }

  // ---------------------------------------------------------------

  private lazy val emits: Seq[Yap.Emit] = {
    import spark.implicits._
    val frames = (0 until nPlays).flatMap(playFrames)
    val plays = (0 until nPlays)
      .map(p => (1L + p / 100, (p % 100).toLong, 100L))
      .toDF("gameId", "playId", "ballCarrierId")
    // the players dim maps nflId→position, so each archetype's position
    // gets its own tackler id (the generator emits a shared 200L)
    val positions = Seq("QB", "DT", "CB", "FS", "MLB", "OLB")
    val posId = (0 until nPlays).map(p => p -> (200L + positions.indexOf(position(p)))).toMap
    val tracking = frames.map(f =>
      if (f.nflId == 200L)
        f.copy(nflId = posId((f.gameId.toInt - 1) * 100 + f.playId.toInt))
      else f).toDF()
    val players = (Seq((100L, "Carrier", "RB")) ++
      positions.zipWithIndex.map { case (pos, i) => (200L + i, s"T$pos", pos) })
      .toDF("nflId", "displayName", "position")
    val tackles = (0 until nPlays)
      .map(p => (1L + p / 100, (p % 100).toLong, posId(p)))
      .toDF("gameId", "playId", "nflId")
    Yap.run(spark, tracking, plays, players, tackles).collect().toSeq
  }

  private def key(p: Int): (Long, Long) = (1L + p / 100, (p % 100).toLong)

  test("every play lands in exactly one branch: yap+opt rows or dead letter") {
    val byPlay = emits.groupBy(e => (e.game_ID, e.play_ID))
    assert(byPlay.size == nPlays)
    for (p <- 0 until nPlays) {
      val es = byPlay(key(p))
      val kinds = es.map(_.kind).toSet
      if (Set("deadpos", "nostart", "nostop")(archetype(p)))
        assert(kinds == Set("error"), s"play $p (${archetype(p)}): $kinds")
      else {
        assert(kinds.contains("yap") && kinds.contains("max_params_opt"),
          s"play $p (${archetype(p)}): $kinds")
        assert(!kinds.contains("error"))
      }
    }
  }

  test("branch coverage is structural: every archetype occurs ≥ 10 times") {
    val counts = (0 until nPlays).groupBy(archetype).map { case (k, v) => k -> v.size }
    assert(counts.forall(_._2 >= 10), counts.toString)
    // and the pursuit archetype itself splits into feasible + infeasible
    val pursuitYaps = (0 until nPlays).filter(p => archetype(p) == "pursuit")
      .map(p => emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "yap").get)
    assert(pursuitYaps.count(_.YAP.isDefined) >= 10, "need ≥10 feasible pursuit plays")
  }

  test("dead letters carry the reference's error semantics") {
    for (p <- 0 until nPlays) {
      val errs = emits.filter(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "error")
      archetype(p) match {
        case "deadpos" => assert(errs.exists(_.error.exists(_.contains("unknown tackler position"))))
        case "nostart" => assert(errs.exists(_.error.exists(_.contains("no start event"))))
        case "nostop"  => assert(errs.exists(_.error.exists(_.contains("no stop event"))))
        case _         => assert(errs.isEmpty)
      }
    }
  }

  test("fallback plays report range-max over the ACTUAL frames") {
    for (p <- 0 until nPlays if archetype(p) == "fallback") {
      val opt = emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "max_params_opt").get
      val yap = emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "yap").get
      assert(yap.YAP.isEmpty, s"play $p: fallback play must have null YAP")
      assert(opt.max_vel.contains(3.0) && opt.max_accel.contains(1.0),
        s"play $p: expected actual-path range max (3.0, 1.0), got (${opt.max_vel}, ${opt.max_accel})")
    }
  }

  test("never-in-vicinity plays yield null YAP and null optimal metrics") {
    for (p <- 0 until nPlays if archetype(p) == "far") {
      val yap = emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "yap").get
      val opt = emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "max_params_opt").get
      assert(yap.YAP.isEmpty && opt.max_vel.isEmpty && opt.max_accel.isEmpty, s"play $p")
    }
  }

  test("emitted optimal paths satisfy the physics gates they were selected by") {
    for (p <- 0 until nPlays if archetype(p) == "pursuit") {
      val yap = emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "yap").get
      val path = emits.filter(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "path")
        .sortBy(_.frameId.get)
      if (yap.YAP.isEmpty) assert(path.isEmpty, s"play $p: path rows without a YAP")
      else {
        assert(path.nonEmpty, s"play $p: YAP without path rows")
        val frames = playFrames(p)
        val carrier = frames.filter(_.nflId == 100L).sortBy(_.frameId).toArray
        val tackler = frames.filter(_.nflId == 200L).sortBy(_.frameId).toArray
        val idxStart = carrier.indexWhere(_.event.contains("handoff"))
        // splice starts at the start boundary, frameIds contiguous
        assert(path.head.frameId.get == carrier(idxStart).frameId, s"play $p")
        assert(path.map(_.frameId.get) == (path.head.frameId.get until
          path.head.frameId.get + path.length).toList, s"play $p: frame gap")
        // first path point is the tackler's actual position at the start
        // (the solve runs in target-relative coordinates; shifting back
        // must reproduce the initial state up to fp round-trip)
        assert(math.abs(path.head.x.get - tackler(idxStart).x) < 1e-9 &&
          math.abs(path.head.y.get - tackler(idxStart).y) < 1e-9, s"play $p")
        // terminal point is inside the vicinity of the carrier at the
        // chosen horizon — the finalRadius gate that selected this path
        val j = idxStart + path.length - 1
        val dEnd = math.hypot(path.last.x.get - carrier(j).x, path.last.y.get - carrier(j).y)
        assert(dEnd <= rT + 1e-6, s"play $p: final radius $dEnd > $rT")
        // every sampled speed/accel respects the position's hard caps
        val (_, vMax, _, aMax) = Map(
          "CB" -> (5.6, 10.9, 4.2, 9.1), "FS" -> (5.6, 10.9, 4.2, 9.1),
          "MLB" -> (5.0, 10.7, 3.9, 9.4), "OLB" -> (5.0, 10.7, 3.9, 9.4))(position(p))
        assert(path.forall(r => r.s.get <= vMax + 1e-6 && r.a.get <= aMax + 1e-6),
          s"play $p: path exceeds position caps")
      }
    }
  }

  test("pursuit YAP matches the independent fine-RK4 evaluation; flips only inside the gate band") {
    // Outcome-sensitive exclusion (VERDICT r3 §missing 4 / next-4 §5):
    // r3 excluded any play where ANY evaluated horizon grazed the error
    // band — a blanket that silently dropped plays whose DECISION both
    // integrators agreed on. Now the engine's chosen first-feasible
    // horizon is compared with the independent solver's directly:
    //  - same horizon → strict ±0.01 YAP compare, play counts;
    //  - different horizon → allowed ONLY if the disputed horizon's
    //    gates sit inside the band (a legitimate integrator flip),
    //    otherwise the test FAILS. Exclusions are asserted < 5% of
    //    feasible plays.
    var checked = 0
    var feasibleCount = 0
    val excluded = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (p <- 0 until nPlays if archetype(p) == "pursuit") {
      val engYap = emits.find(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "yap").get.YAP
      val pathLen = emits.count(e => (e.game_ID, e.play_ID) == key(p) && e.kind == "path")
      val carrier = playFrames(p).filter(_.nflId == 100L).sortBy(_.frameId).toArray
      val idxStart = carrier.indexWhere(_.event.contains("handoff"))
      // engine's chosen horizon: splice covers [idxStart, j] (contiguity
      // and start alignment pinned by the physics-gates test)
      val jEng = if (engYap.isDefined) Some(idxStart + pathLen - 1) else None
      if (engYap.isDefined) feasibleCount += 1
      val (jInd, indYap, border) = independentEval(p, jEng)
      if (jEng == jInd) {
        for (a <- engYap; b <- indYap)
          assert(math.abs(a - b) <= 0.01 + 1e-9, s"play $p: engine YAP $a vs independent $b")
        checked += 1
      } else {
        val disputed = (jEng, jInd) match {
          case (Some(a), Some(b)) => math.min(a, b)
          case (Some(a), None)    => a
          case (None, Some(b))    => b
          case _                  => -1
        }
        assert(border.getOrElse(disputed, false),
          s"play $p: horizon disagreement (engine=$jEng independent=$jInd) " +
            s"with no borderline gate at disputed horizon $disputed")
        excluded += p
      }
    }
    info(s"strict-checked $checked pursuit plays; excluded ${excluded.size} " +
      s"borderline flips of $feasibleCount feasible (plays ${excluded.mkString(",")})")
    assert(checked >= 100, s"only $checked strict-checked pursuit plays")
    assert(excluded.size <= math.max(1, feasibleCount * 5 / 100),
      s"${excluded.size} exclusions exceed 5% of $feasibleCount feasible plays")
  }
}
