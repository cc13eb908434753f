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

  def reduce(b: Array[(Double, Long)],
             in: (String, Double, Long)): Array[(Double, Long)] = {
    val e = (in._2, in._3)
    if (b.length < k) {
      val out = b :+ e
      scala.util.Sorting.stableSort(out, ord.lt _)
      out
    } else if (ord.lt(e, b(k - 1))) {
      val out = b.clone()
      out(k - 1) = e
      scala.util.Sorting.stableSort(out, ord.lt _)
      out
    } else b
  }

  def merge(a: Array[(Double, Long)],
            b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = (a ++ b).distinct
    scala.util.Sorting.stableSort(out, ord.lt _)
    out.take(k)
  }

  def finish(b: Array[(Double, Long)]): Seq[(Double, Long)] = b.toSeq

  def bufferEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
