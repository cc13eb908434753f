package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** KMV sketch result: how many hashes the sketch kept (< k only for
  * tiny groups), the k-th smallest hash, and the distinct estimate.
  */
case class KmvOut(n_kept: Int, kth_min: Long, est_distinct: Double)

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]]
  * (the engine's UDAF surface; see Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002).
  *
  * State is the sorted array of the k smallest *distinct* hash values
  * seen — bounded at k longs, order-insensitive, and mergeable, so
  * Spark runs it as a partial aggregate: at 100 TB each map task ships
  * k longs per group key instead of shuffling every token (the exact
  * `count(DISTINCT ...)` alternative moves the full token universe
  * through the exchange). Estimator: if the sketch saturated,
  * `est = (k-1) · space / kth_min` (hashes ~ Uniform[0, space)); below
  * saturation the sketch has seen every distinct value and is exact.
  *
  * Determinism: the k smallest distinct values of a multiset do not
  * depend on arrival order or partitioning, so the DuckDB oracle can
  * replay the same result from a sorted-distinct window
  * (OracleSql.q26Kmv) — sketch parity is exact, not approximate.
  */
class KmvSketch(k: Int, space: Long)
    extends Aggregator[(String, Long), Array[Long], KmvOut] with Serializable {
  require(k > 1, s"KMV needs k > 1, got $k")

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], in: (String, Long)): Array[Long] = {
    val h = in._2
    val i = java.util.Arrays.binarySearch(b, h)
    if (i >= 0) b // already kept — set semantics
    else {
      val ins = -i - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) { // smaller than the current k-th min: displace it
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val buf = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < buf.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || buf(n - 1) != v) { buf(n) = v; n += 1 }
    }
    if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
  }

  def finish(b: Array[Long]): KmvOut =
    if (b.length < k) KmvOut(b.length, -1L, b.length.toDouble)
    else KmvOut(k, b(k - 1), (k - 1).toDouble * space.toDouble / b(k - 1).toDouble)

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[KmvOut] = ExpressionEncoder()
}
