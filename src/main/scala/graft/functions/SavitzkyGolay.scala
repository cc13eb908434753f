package graft.functions

import org.apache.commons.math3.linear._

/** Savitzky-Golay FIR coefficients (derivative 0).
  *
  * Public closed form: the smoothed value at the window center is the
  * degree-`polyorder` least-squares polynomial fit over the centered
  * odd-length window, evaluated at the center. That is a fixed linear
  * functional of the window samples: c_j = [(VᵀV)⁻¹Vᵀ]₀ⱼ for the
  * Vandermonde V over offsets. The reference uses scipy's
  * `savgol_filter` (`/root/reference/peak_detection.py:109,167,192`);
  * we solve the same least-squares system with a scaled basis
  * (offsets / halfwidth, i.e. in [-1,1]) for conditioning — the value
  * at 0 is invariant under the scaling.
  */
object SavitzkyGolay {

  /** Coefficients c(0..window-1), index j corresponding to offset
    * j - window/2; smoothed[i] = Σ_j c(j) · y(i + j - window/2).
    */
  def coeffs(window: Int, polyorder: Int): Array[Double] = {
    require(window % 2 == 1, s"window must be odd, got $window")
    require(polyorder < window, s"polyorder $polyorder >= window $window")
    val k = window / 2
    val scale = math.max(k, 1).toDouble
    val v = Array.tabulate(window, polyorder + 1) { (j, m) =>
      math.pow((j - k) / scale, m)
    }
    val vm = new Array2DRowRealMatrix(v, false)
    val m = vm.transpose().multiply(vm) // (p+1)×(p+1) normal matrix
    val e0 = new ArrayRealVector(
      Array.tabulate(polyorder + 1)(i => if (i == 0) 1.0 else 0.0)
    )
    val z = new QRDecomposition(m).getSolver.solve(e0)
    Array.tabulate(window) { j =>
      var acc = 0.0
      var p = 0
      while (p <= polyorder) { acc += v(j)(p) * z.getEntry(p); p += 1 }
      acc
    }
  }
}
