package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FindPeaks

/** Hand-derived goldens for the scipy-parity kernel (SURVEY §5.2.4 —
  * scipy itself is not installed here; expectations derived on paper
  * from the published semantics).
  */
class FindPeaksSpec extends AnyFunSuite {

  test("local maxima: strict, plateau midpoint, endpoints excluded") {
    assert(FindPeaks.localMaxima(Array(0, 1, 0)).toSeq === Seq(1))
    // plateau 1..2 -> left-biased midpoint 1
    assert(FindPeaks.localMaxima(Array(0, 1, 1, 0)).toSeq === Seq(1))
    // plateau 1..3 -> midpoint 2
    assert(FindPeaks.localMaxima(Array(0, 1, 1, 1, 0)).toSeq === Seq(2))
    // ascending plateau is not a peak; the later strict max is
    assert(FindPeaks.localMaxima(Array(0, 1, 1, 2, 0)).toSeq === Seq(3))
    // two peaks
    assert(FindPeaks.localMaxima(Array(0, 2, 1, 2, 0)).toSeq === Seq(1, 3))
    // endpoints never peaks
    assert(FindPeaks.localMaxima(Array(2.0, 1, 2)).toSeq === Seq())
    // plateau running into the end is not a peak
    assert(FindPeaks.localMaxima(Array(0.0, 1, 1)).toSeq === Seq())
  }

  test("greedy distance: highest wins, strict <ceil(distance), chains") {
    def sel(peaks: Array[Int], h: Array[Double]) =
      peaks.zip(FindPeaks.selectByPeakDistance(peaks, h, 20.0))
        .collect { case (p, true) => p }.toSeq
    // 25 removed by 10 (higher), 45 survives (distance 20 !< 20)
    assert(sel(Array(10, 25, 45), Array(5, 4, 3)) === Seq(10, 45))
    // middle highest removes both sides
    assert(sel(Array(10, 25, 40), Array(3, 5, 4)) === Seq(25))
    // chain: 10 removes 28; 46 survives because 28 (its only <20
    // neighbour) was already removed — order matters
    assert(sel(Array(10, 28, 46), Array(5, 4, 4.5)) === Seq(10, 46))
  }

  test("prominence: bases, higher-or-equal stop, window clip") {
    val x = Array(5.0, 0, 3, 1, 2, 0, 4)
    val pr = FindPeaks.peakProminences(x, Array(2, 4), 1000)
    assert(pr(0).value === 3.0) // stopped by x(0)=5 left, x(6)=4 right
    assert(pr(0).leftBase === 1 && pr(0).rightBase === 5)
    assert(pr(1).value === 1.0) // left stopped by x(2)=3 -> leftMin 1
    assert(pr(1).leftBase === 3 && pr(1).rightBase === 5)

    // wlen clip changes the left minimum
    val y = Array(0.0, 0.2, 3, 2, 4, 0.1, 0)
    val unclipped = FindPeaks.peakProminences(y, Array(4), 1000)(0)
    assert(unclipped.value === 4.0)
    val clipped = FindPeaks.peakProminences(y, Array(4), 5)(0) // half=2
    assert(clipped.value === 2.0) // left scan limited to idx>=2 -> min 2
  }

  test("width: symmetric triangle interpolates to exactly 1.0 at half height") {
    val x = Array(0.0, 2.0, 0.0)
    val pr = FindPeaks.peakProminences(x, Array(1), 1000)(0)
    assert(pr.value === 2.0)
    val w = FindPeaks.peakWidth(x, 1, pr, 0.5)
    assert(math.abs(w - 1.0) < 1e-12)
  }

  test("findPeaks end-to-end: distance then prominence then width") {
    // two noise bumps near a tall peak: distance removes the close one,
    // prominence keeps the tall ones only
    val x = Array.tabulate(200) { i =>
      10.0 * math.exp(-math.pow(i - 100, 2) / 50.0) +
        (if (i == 110) 0.0 else 0.0) +
        2.0 * math.exp(-math.pow(i - 30, 2) / 18.0)
    }
    val p = FindPeaks.findPeaks(x)
    assert(p.toSeq === Seq(30, 100))
  }
}
