package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded-heap per-group top-k as a typed [[Aggregator]] (the UDAF
  * surface): keeps the `k` (value, id) pairs ranked best-first by
  * (value DESC, id ASC). `id` must be unique within the group, which
  * makes the result a deterministic TOTAL order — merge- and
  * partition-order-free, so it runs as a partial aggregate.
  *
  * This is the scale-correct top-k-PER-GROUP shape (SURVEY §2.6's
  * bounded-rank discipline, at the aggregate level):
  *
  *  - a row_number window sorts every group's FULL extent — at 100 TB
  *    a hot group is a multi-GB per-task sort;
  *  - `slice(sort_array(collect_list(...)))` buffers every group row
  *    in one aggregation buffer before cutting — unbounded state;
  *  - this aggregator ships ≤ k pairs per group per map task through
  *    the exchange and merges k-vs-k — state is O(k) forever.
  *
  * The DuckDB oracle replays it with a row_number window (exact
  * equality: below-k groups keep everything, above-k groups keep the
  * lexicographic (value DESC, id ASC) prefix).
  */
class TopKByValue(k: Int)
    extends Aggregator[(String, Double, Long), Array[(Double, Long)], Seq[(Double, Long)]]
    with Serializable {
  require(k > 0, s"top-k needs k > 0, got $k")

  // best-first: value DESC, id ASC
  private val ord =
    Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))

  def zero: Array[(Double, Long)] = Array.empty

  // Both buffer arrays are ALWAYS sorted best-first: zero is trivially
  // sorted, reduce inserts at the binary-search position, and merge
  // interleaves two sorted runs. That invariant is what makes reduce
  // O(log k + k) per accepted row (the round-5 form re-sorted the
  // whole buffer on every accept — O(k log k)/row, visible once k
  // grows past toy sizes) and merge a linear two-pointer pass.

  /** Sorted insert of `e` into sorted `b`, keeping the best `keep`. */
  private def insertSorted(b: Array[(Double, Long)], e: (Double, Long),
                           keep: Int): Array[(Double, Long)] = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(e, b(mid))) hi = mid else lo = mid + 1
    }
    val n = math.min(b.length + 1, keep)
    val out = new Array[(Double, Long)](n)
    System.arraycopy(b, 0, out, 0, math.min(lo, n))
    if (lo < n) {
      out(lo) = e
      System.arraycopy(b, lo, out, lo + 1, n - lo - 1)
    }
    out
  }

  def reduce(b: Array[(Double, Long)],
             in: (String, Double, Long)): Array[(Double, Long)] = {
    val e = (in._2, in._3)
    if (b.length < k) insertSorted(b, e, k)
    else if (ord.lt(e, b(k - 1))) insertSorted(b, e, k)
    else b
  }

  def merge(a: Array[(Double, Long)],
            b: Array[(Double, Long)]): Array[(Double, Long)] = {
    // two-pointer merge of two sorted runs. No de-duplication: the
    // documented contract is that `id` is unique within the group, so
    // a (value, id) pair can appear in at most one input partition —
    // the round-5 `.distinct` here was dead code under the contract
    // and would have silently HIDDEN a contract violation (fewer rows
    // than the row_number oracle) instead of letting it surface as a
    // visible mismatch.
    val n = math.min(a.length + b.length, k)
    val out = new Array[(Double, Long)](n)
    var i = 0
    var j = 0
    var o = 0
    while (o < n) {
      if (j >= b.length || (i < a.length && !ord.lt(b(j), a(i)))) {
        out(o) = a(i); i += 1
      } else {
        out(o) = b(j); j += 1
      }
      o += 1
    }
    out
  }

  def finish(b: Array[(Double, Long)]): Seq[(Double, Long)] = b.toSeq

  def bufferEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
