package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] (the
  * UDAF surface; Misra & Gries 1982, merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * State is a counter map bounded at `k` entries. Reduce: increment a
  * present token; insert at 1 if there is room; otherwise decrement
  * every counter and drop zeros. Merge: add counts pairwise, then if
  * more than `k` counters survive, subtract the (k+1)-th largest count
  * from all and keep the positive ones — the mergeable-summaries rule
  * that preserves the `true − n/(k+1) ≤ est ≤ true` guarantee under
  * ANY merge tree, which is what makes it a partial aggregate: at
  * 100 TB each map task ships ≤ k counters per group instead of
  * shuffling every token occurrence.
  *
  * Determinism: BELOW saturation (≤ k distinct tokens per group) no
  * decrement ever fires, counts are exact, and the result is
  * order-independent — the regime the DuckDB oracle replays
  * (OracleSql.q40HeavyHitters, exact counts). Above saturation the
  * surviving counter VALUES depend on merge order, but the ε-guarantee
  * does not — MgSketchSpec pins it property-style.
  */
class MgSketch(k: Int)
    extends Aggregator[(String, String), Map[String, Long], Seq[(String, Long)]]
    with Serializable {
  require(k > 0, s"Misra-Gries needs k > 0, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], in: (String, String)): Map[String, Long] = {
    val t = in._2
    b.get(t) match {
      case Some(c) => b.updated(t, c + 1)
      case None if b.size < k => b.updated(t, 1L)
      case None =>
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = sum.values.toArray.sortBy(-_).apply(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  /** Counters sorted by (count desc, token asc) — a deterministic
    * order for the exact (sub-saturation) regime.
    */
  def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (t, c) => (-c, t) }

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** Deterministic bounded-state per-group sample: keeps the `k`
  * (hash, id) pairs with the smallest hashes — the hash-rank
  * equivalent of a k-reservoir, but reproducible across runs,
  * partitionings, and engines (same contract as Pipeline.hashSplit).
  * Mergeable and order-insensitive (the k smallest of a set are
  * order-free), so it runs as a partial aggregate: no per-group sort,
  * no window over the full group — the scale-correct top-k-per-group
  * shape. The DuckDB oracle replays it with a row_number window.
  */
class HashReservoir(k: Int)
    extends Aggregator[(String, Long, Long), Array[(Long, Long)], Seq[(Long, Long)]]
    with Serializable {
  require(k > 0, s"reservoir needs k > 0, got $k")

  private val ord = Ordering.Tuple2[Long, Long]

  def zero: Array[(Long, Long)] = Array.empty

  def reduce(b: Array[(Long, Long)], in: (String, Long, Long)): Array[(Long, Long)] = {
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

  def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val out = (a ++ b).distinct
    scala.util.Sorting.stableSort(out, ord.lt _)
    out.take(k)
  }

  def finish(b: Array[(Long, Long)]): Seq[(Long, Long)] = b.toSeq

  def bufferEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

/** Value-carrying variant of [[HashReservoir]]: keeps the `k`
  * (hash, id, value) triples with the smallest (hash, id) — the
  * deterministic uniform sample a quantile sketch reads its values
  * from (q111). The id stays in the ordering key so hash collisions
  * cannot drop rows (ids are unique; (hash, value) alone would
  * `distinct` away a collision the oracle's row_number keeps).
  * Same bounded-state partial-aggregate shape as HashReservoir.
  */
class HashValueReservoir(k: Int)
    extends Aggregator[(String, Long, Long, Double), Array[(Long, Long, Double)], Seq[Double]]
    with Serializable {
  require(k > 0, s"reservoir needs k > 0, got $k")

  private val ord =
    Ordering.by[(Long, Long, Double), (Long, Long)](t => (t._1, t._2))

  def zero: Array[(Long, Long, Double)] = Array.empty

  def reduce(b: Array[(Long, Long, Double)],
             in: (String, Long, Long, Double)): Array[(Long, Long, Double)] = {
    val e = (in._2, in._3, in._4)
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

  def merge(a: Array[(Long, Long, Double)],
            b: Array[(Long, Long, Double)]): Array[(Long, Long, Double)] = {
    val out = (a ++ b).distinct
    scala.util.Sorting.stableSort(out, ord.lt _)
    out.take(k)
  }

  def finish(b: Array[(Long, Long, Double)]): Seq[Double] = b.map(_._3).toSeq

  def bufferEncoder: Encoder[Array[(Long, Long, Double)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
