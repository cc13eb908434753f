package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SavitzkyGolay

class SavitzkyGolaySpec extends AnyFunSuite {

  test("(5,2) matches the published quadratic table [-3,12,17,12,-3]/35") {
    val c = SavitzkyGolay.coeffs(5, 2)
    val exp = Array(-3.0, 12.0, 17.0, 12.0, -3.0).map(_ / 35.0)
    c.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("(7,2) matches the published table [-2,3,6,7,6,3,-2]/21") {
    val c = SavitzkyGolay.coeffs(7, 2)
    val exp = Array(-2.0, 3.0, 6.0, 7.0, 6.0, 3.0, -2.0).map(_ / 21.0)
    c.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("coefficients sum to 1 and are symmetric (reference windows)") {
    for ((w, p) <- Seq((51, 7), (301, 3))) {
      val c = SavitzkyGolay.coeffs(w, p)
      assert(math.abs(c.sum - 1.0) < 1e-9, s"sum for ($w,$p)")
      (0 until w / 2).foreach { j =>
        assert(math.abs(c(j) - c(w - 1 - j)) < 1e-9, s"symmetry ($w,$p) at $j")
      }
    }
  }

  test("polynomial reproduction: degree<=polyorder signals pass unchanged") {
    val c = SavitzkyGolay.coeffs(51, 7)
    val k = 25
    // cubic evaluated on the window, filtered at center must equal f(0)
    def f(x: Double) = 2.0 + 3.0 * x - 0.5 * x * x + 0.01 * x * x * x
    val got = (0 until 51).map(j => c(j) * f((j - k).toDouble)).sum
    assert(math.abs(got - f(0.0)) < 1e-8)
  }
}
