package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Faithful port of scipy's `find_peaks` pipeline as used by the
  * reference (`/root/reference/peak_detection.py:251`):
  * `find_peaks(smooth, width=1, distance=20, rel_height=0.3,
  * prominence=0.3, wlen=250)`.
  *
  * Public scipy semantics, in scipy's fixed filter order (SURVEY §2.5):
  *  1. local maxima with the flat-plateau midpoint rule, endpoints
  *     excluded;
  *  2. greedy distance dedup — highest first, remove neighbours closer
  *     than `ceil(distance)`;
  *  3. prominence with the evaluation window clipped to `wlen` (rounded
  *     up to odd, half-width each side), keep ≥ prominence;
  *  4. width at `height − relHeight·prominence` via linear interpolation
  *     between the prominence bases, keep ≥ width.
  *
  * All formulas keep scipy's exact arithmetic shape so doubles match a
  * straightforward SQL re-derivation bit-for-bit.
  */
object FindPeaks {

  final case class Prominence(value: Double, leftBase: Int, rightBase: Int)

  /** Strict/plateau local maxima; a plateau reports its (left-biased)
    * midpoint. Signal endpoints are never peaks.
    */
  def localMaxima(x: Array[Double]): Array[Int] = {
    val out = ArrayBuffer.empty[Int]
    val iMax = x.length - 1
    var i = 1
    while (i < iMax) {
      if (x(i - 1) < x(i)) {
        var iAhead = i + 1
        while (iAhead < iMax && x(iAhead) == x(i)) iAhead += 1
        if (x(iAhead) < x(i)) {
          val leftEdge = i
          val rightEdge = iAhead - 1
          out += (leftEdge + rightEdge) / 2
          i = iAhead
        }
      }
      i += 1
    }
    out.toArray
  }

  /** Greedy distance selection: iterate candidates by priority
    * (height) descending, keep unless within `< ceil(distance)` of an
    * already-kept peak. Ties in height iterate higher-index first (a
    * deterministic stand-in for numpy's unstable argsort; tied doubles
    * do not occur on continuous data).
    */
  def selectByPeakDistance(
      peaks: Array[Int],
      priority: Array[Double],
      distance: Double
  ): Array[Boolean] = {
    val n = peaks.length
    val dist = math.ceil(distance)
    val keep = Array.fill(n)(true)
    // ascending stable sort by (priority, position); iterate reversed
    val order = peaks.indices.sortBy(j => (priority(j), j))
    var oi = n - 1
    while (oi >= 0) {
      val j = order(oi)
      if (keep(j)) {
        var k = j - 1
        while (k >= 0 && peaks(j) - peaks(k) < dist) { keep(k) = false; k -= 1 }
        k = j + 1
        while (k < n && peaks(k) - peaks(j) < dist) { keep(k) = false; k += 1 }
      }
      oi -= 1
    }
    keep
  }

  /** Prominence of each peak with the scan window clipped to `wlen`
    * (scipy: wlen rounded up to the next odd, half = wlen/2 each side).
    */
  def peakProminences(
      x: Array[Double],
      peaks: Array[Int],
      wlen: Int
  ): Array[Prominence] = {
    val half = {
      val w = if (wlen % 2 == 0) wlen + 1 else wlen
      w / 2
    }
    peaks.map { p =>
      val h = x(p)
      val iMin = math.max(p - half, 0)
      val iMax = math.min(p + half, x.length - 1)
      var leftMin = h
      var leftBase = p
      var i = p
      while (i >= iMin && x(i) <= h) {
        if (x(i) < leftMin) { leftMin = x(i); leftBase = i }
        i -= 1
      }
      var rightMin = h
      var rightBase = p
      i = p
      while (i <= iMax && x(i) <= h) {
        if (x(i) < rightMin) { rightMin = x(i); rightBase = i }
        i += 1
      }
      Prominence(h - math.max(leftMin, rightMin), leftBase, rightBase)
    }
  }

  /** Interpolated width at `x[peak] − relHeight·prominence`, measured
    * between the prominence bases (scipy `_peak_widths`).
    */
  def peakWidth(
      x: Array[Double],
      peak: Int,
      prom: Prominence,
      relHeight: Double
  ): Double = {
    val height = x(peak) - prom.value * relHeight
    var i = peak
    while (prom.leftBase < i && height < x(i)) i -= 1
    var leftIp = i.toDouble
    if (x(i) < height) leftIp += (height - x(i)) / (x(i + 1) - x(i))
    i = peak
    while (i < prom.rightBase && height < x(i)) i += 1
    var rightIp = i.toDouble
    if (x(i) < height) rightIp -= (height - x(i)) / (x(i - 1) - x(i))
    rightIp - leftIp
  }

  /** The full reference pipeline (defaults of
    * `/root/reference/peak_detection.py:17`): returns kept peak indices.
    */
  def findPeaks(
      x: Array[Double],
      width: Double = 1.0,
      distance: Double = 20.0,
      relHeight: Double = 0.3,
      prominence: Double = 0.3,
      wlen: Int = 250
  ): Array[Int] = {
    var peaks = localMaxima(x)
    val keep = selectByPeakDistance(peaks, peaks.map(x(_)), distance)
    peaks = peaks.zip(keep).collect { case (p, true) => p }
    val proms = peakProminences(x, peaks, wlen)
    val kept = peaks.zip(proms).filter(_._2.value >= prominence)
    kept.collect {
      case (p, pr) if peakWidth(x, p, pr, relHeight) >= width => p
    }
  }
}
