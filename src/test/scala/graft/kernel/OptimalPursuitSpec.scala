package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import Linalg._

/** K1–K3 against golden values computed by an independent fine-step
  * (h=1e-5) classical RK4 integration of the same ODEs in
  * double-precision numpy — effectively the exact solution, so the
  * tolerances below are the RK45 truncation error at rtol=1e-3.
  *
  * Fixture: pursuer at relative (-8, 3), initial velocity (1.5, -0.5),
  * V_max=5, A_max=4, R_t=1, horizon 2 s sampled at 0.1 s. */
class OptimalPursuitSpec extends AnyFunSuite {

  private val t = (0 to 20).map(_ * 0.1).toArray
  private lazy val path = OptimalPursuit.solveOptimalPath(-8.0, 3.0, 1.5, -0.5, t, 5.0, 4.0, 1.0)

  test("Riccati sweep S0 matches the fine-RK4 golden matrix") {
    val cR = 2.0; val betaA = 2.0 / 16.0; val alphaV = 2.0 / 25.0
    val a = diag(0.0, 0.0, alphaV, alphaV)
    val bInv = diag(1.0 / betaA, 1.0 / betaA)
    val sF = diag(cR, cR, 0.0, 0.0)
    val (_, s0Flat) = RK45.integrate(
      (_, s, out) => {
        val r = OptimalPursuit.sweepSDot(s, a, bInv)
        System.arraycopy(r, 0, out, 0, 16)
      }, 0.0, 2.0, flatten(sF), Array.empty)
    val s0 = reshape(s0Flat, 4, 4)
    val golden = Array(
      Array(0.090098784725, 0.0, 0.103801520839, 0.0),
      Array(0.0, 0.090098784725, 0.0, 0.103801520839),
      Array(0.103801520839, 0.0, 0.211755102512, 0.0),
      Array(0.0, 0.103801520839, 0.0, 0.211755102512))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(math.abs(s0(i)(j) - golden(i)(j)) < 5e-3, s"S0($i,$j)=${s0(i)(j)}")
  }

  test("optimal path positions match golden trajectory") {
    val gx = Array(-8.0, -7.83007152, -7.62253379, -7.38058097, -7.10718685,
      -6.80512391, -6.47698101, -6.12518003, -5.75199138, -5.35954847,
      -4.94986146, -4.52483005, -4.08625572, -3.63585321, -3.17526151,
      -2.70605439, -2.22975044, -1.74782279, -1.26170858, -0.77281813, -0.282544)
    val gy = Array(3.0, 2.94201247, 2.86895079, 2.78209521, 2.68263765,
      2.57168934, 2.45028793, 2.31940414, 2.17994796, 2.03277449, 1.87868941,
      1.71845415, 1.55279075, 1.38238651, 1.20789834, 1.02995702, 0.84917123,
      0.6661314, 0.48141356, 0.29558298, 0.1091978)
    t.indices.foreach { i =>
      assert(math.abs(path.x(i) - gx(i)) < 0.02, s"x($i)=${path.x(i)} vs ${gx(i)}")
      assert(math.abs(path.y(i) - gy(i)) < 0.02, s"y($i)=${path.y(i)} vs ${gy(i)}")
    }
  }

  test("velocities and accelerations match golden") {
    val gu = Array(1.5, 1.89284831, 2.25258615, 2.58151707, 2.88174737,
      3.15519953, 3.40362459, 3.6286133, 3.83160638, 4.01390366, 4.17667248,
      4.3209551, 4.44767543, 4.55764492, 4.65156773, 4.73004531, 4.79358017,
      4.84257915, 4.87735601, 4.89813345, 4.90504452)
    val gax = Array(4.1022361, 3.75891993, 3.43967369, 3.14245309, 2.86535493,
      2.60660482, 2.36454588, 2.1376281, 1.92439844, 1.72349151, 1.5336208,
      1.3535705, 1.18218768, 1.01837489, 0.86108317, 0.70930533, 0.56206947,
      0.41843277, 0.27747547, 0.13829495, 0.0)
    t.indices.foreach { i =>
      assert(math.abs(path.u(i) - gu(i)) < 0.1, s"u($i)=${path.u(i)}")
      // costate errors are amplified by 1/β = A_max²/2 = 8 into the
      // accelerations, so the rtol=1e-3 integration shows up as ~2% here
      assert(math.abs(path.ax(i) - gax(i)) < 0.12, s"ax($i)=${path.ax(i)}")
    }
  }

  test("summary metrics match golden (feasibility gate inputs)") {
    assert(math.abs(path.finalRadius - 0.302911) < 0.05)
    assert(math.abs(path.maxSpeed - 5.247556) < 0.1)
    assert(math.abs(path.maxAccel - 4.419478) < 0.1)
  }

  test("specialized RHS fast paths equal the general-matrix forms") {
    val rnd = new scala.util.Random(7)
    val alphaV = 2.0 / 25.0
    val betaA = 2.0 / 16.0
    val a = diag(0.0, 0.0, alphaV, alphaV)
    val bInv = diag(1.0 / betaA, 1.0 / betaA)
    (1 to 50).foreach { _ =>
      val s = Array.fill(16)(rnd.nextDouble() * 4 - 2)
      val g = OptimalPursuit.sweepSDot(s, a, bInv)
      val f = OptimalPursuit.sweepSDotFast(s, alphaV, 1.0 / betaA)
      g.indices.foreach(i => assert(math.abs(g(i) - f(i)) < 1e-12, s"sweep idx $i"))
      val y = Array.fill(8)(rnd.nextDouble() * 10 - 5)
      val g2 = OptimalPursuit.stateCostateDot(y, a, bInv)
      val f2 = OptimalPursuit.stateCostateDotFast(y, alphaV, 1.0 / betaA)
      g2.indices.foreach(i => assert(math.abs(g2(i) - f2(i)) < 1e-12, s"state idx $i"))
    }
  }

  test("longer horizon closes the pursuit further (monotone feasibility)") {
    val short = OptimalPursuit.solveOptimalPath(-8.0, 3.0, 1.5, -0.5,
      (0 to 5).map(_ * 0.1).toArray, 5.0, 4.0, 1.0)
    assert(short.finalRadius > path.finalRadius)
  }

  test("already-at-target start stays near the target") {
    val p = OptimalPursuit.solveOptimalPath(0.05, 0.0, 0.0, 0.0,
      (0 to 10).map(_ * 0.1).toArray, 5.0, 4.0, 1.0)
    assert(p.finalRadius < 0.1)
    assert(p.maxSpeed < 0.2)
  }
}
