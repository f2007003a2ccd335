package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** RK45 against closed-form linear-system solutions (SURVEY §5 item 1):
  * a linear ODE's exact solution is the matrix exponential, so errors
  * here are pure integrator error and must sit within the configured
  * tolerances (rtol=1e-3, atol=1e-6 — the reference's scipy defaults). */
class RK45Spec extends AnyFunSuite {

  test("exponential decay matches e^-t at dense-output points") {
    val tEval = (0 to 50).map(_ * 0.1).toArray
    val (ys, yF) = RK45.integrate((_, y, o) => o(0) = -y(0), 0.0, 5.0, Array(1.0), tEval)
    tEval.zip(ys).foreach { case (t, y) =>
      assert(math.abs(y(0) - math.exp(-t)) < 5e-4, s"at t=$t: ${y(0)} vs ${math.exp(-t)}")
    }
    assert(math.abs(yF(0) - math.exp(-5.0)) < 5e-4)
  }

  test("harmonic oscillator conserves the closed-form solution") {
    // y'' = -y: y = cos t, y' = -sin t
    val tEval = (0 to 40).map(_ * 0.25).toArray
    val (ys, _) = RK45.integrate(
      (_, y, o) => { o(0) = y(1); o(1) = -y(0) }, 0.0, 10.0, Array(1.0, 0.0), tEval)
    tEval.zip(ys).foreach { case (t, y) =>
      assert(math.abs(y(0) - math.cos(t)) < 5e-3, s"cos at t=$t: ${y(0)}")
      assert(math.abs(y(1) + math.sin(t)) < 5e-3, s"-sin at t=$t: ${y(1)}")
    }
  }

  test("stiff-ish fast decay still accurate (step control shrinks h)") {
    val (_, yF) = RK45.integrate((_, y, o) => o(0) = -50.0 * y(0), 0.0, 1.0, Array(1.0), Array.empty)
    assert(math.abs(yF(0) - math.exp(-50.0)) < 1e-6)
  }

  test("zero-length horizon returns the initial state") {
    val (ys, yF) = RK45.integrate((_, y, o) => o(0) = y(0), 0.0, 0.0, Array(3.0), Array(0.0))
    assert(ys(0)(0) == 3.0 && yF(0) == 3.0)
  }
}
