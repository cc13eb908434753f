package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranking without a single-partition sort — the shared
  * discipline behind every top-N / global-rank query in the repo
  * (the round-3 verdict flagged five queries re-inventing or skipping
  * it; they all route through here now).
  *
  * Two shapes, two scale stories:
  *
  *  - [[topKRanked]] — when only the TOP k rows survive. Plans as
  *    TakeOrderedAndProject: each partition keeps its local top-k
  *    (a bounded heap, no sort), the driver merges k·p candidate
  *    rows, and the rank window runs over ≤ k rows on one task. At
  *    100 TB the full input is never globally sorted and nothing
  *    larger than k rows ever sits in one place.
  *
  *  - [[globalRank]] — when every row needs its EXACT global rank
  *    (output is the ranking itself, e.g. Q115's fused rank lists).
  *    Two-level: range-partition on the sort key (so partition id
  *    order == key order), rank locally inside each partition, then
  *    add per-partition row-count offsets. The offset table has one
  *    row per partition — it stays in a broadcast join — and no
  *    partition ever holds more than its range slice. This is the
  *    same counting scheme RDD.zipWithIndex uses, kept declarative.
  *
  * Neither shape emits a partitionBy-less WindowExec over an
  * unbounded input; PlanQualitySpec pins that invariant for every
  * registered query.
  */
object GlobalRank {

  /** Global top-k by `order`, with ranks 1..k in `rankCol` (long).
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject; the
    * row_number window then sees a ≤ k-row input, so its single
    * partition is bounded by construction.
    */
  def topKRanked(df: DataFrame, k: Int, rankCol: String,
                 order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol,
        row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** Exact global row_number (1-based, long) over an UNBOUNDED input,
    * as `rankCol`, without ever sorting in one partition.
    *
    * Level 1: `repartitionByRange` on the full ordering key (unique
    * keys ⇒ rank is independent of where range bounds fall; the
    * sampled bounds only affect balance, not output). Partition ids
    * ascend with key order, including for descending sort columns.
    *
    * DUPLICATE ordering keys: each distinct key value still gets
    * exactly its oracle rank block (contiguous, correct bounds —
    * GlobalRankSpec pins this under heavy ties), but WHICH duplicate
    * gets which rank within the run is positionally arbitrary.
    * Callers that hash-compare row-level output must make the
    * ordering total (append a unique column, as every registered
    * query does); callers consuming rank blocks/quantiles need
    * nothing.
    * Level 2: local row_number per partition, then offset = total
    * rows in earlier partitions, computed with a triangular join on
    * the one-row-per-partition count table (broadcast-sized; avoids
    * reintroducing a global window for the cumulative sum).
    */
  def globalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val parted = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lrank",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
    val cnts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offs = cnts.as("a")
      .join(cnts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    local.join(broadcast(offs), "__pid")
      .withColumn(rankCol, (col("__lrank") + col("__off")).cast("long"))
      .drop("__pid", "__lrank", "__off")
  }

  /** Exact global running sum of `value` in `order`-order (rows
    * unbounded-preceding..current), as `outCol` — the distributed
    * form of `sum(v) OVER (ORDER BY k)`. Same two-level scheme as
    * [[globalRank]]: local running sums inside each range partition,
    * plus the broadcast total of all earlier partitions.
    */
  def globalCumSum(df: DataFrame, value: Column, outCol: String,
                   order: Column*): DataFrame =
    globalCumSums(df, Seq(value -> outCol), order: _*)

  /** [[globalCumSum]] for SEVERAL values in ONE pass: every running
    * sum shares the single range shuffle, the single per-partition
    * window sort, and the single broadcast offset table (an n-column
    * cumulative would otherwise pay the range-exchange n times —
    * exactly the shape a two-sample ECDF comparison needs).
    */
  def globalCumSums(df: DataFrame, values: Seq[(Column, String)],
                    order: Column*): DataFrame = {
    val parted = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val vcols = values.zipWithIndex.map { case ((v, _), i) => (s"__v$i", v) }
    val staged = vcols.foldLeft(parted) { case (d, (n, v)) => d.withColumn(n, v) }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = vcols.foldLeft(staged) { case (d, (n, _)) =>
      d.withColumn(s"__lcum_$n", sum(col(n)).over(w))
    }
    val cnts = local.groupBy(col("__pid"))
      .agg(vcols.head match { case (n, _) => sum(col(n)).as(s"__psum_$n") },
        vcols.tail.map { case (n, _) => sum(col(n)).as(s"__psum_$n") }: _*)
    val offs = cnts.as("a")
      .join(cnts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(vcols.head match { case (n, _) =>
          coalesce(sum(col(s"b.__psum_$n")), lit(0L)).as(s"__off_$n") },
        vcols.tail.map { case (n, _) =>
          coalesce(sum(col(s"b.__psum_$n")), lit(0L)).as(s"__off_$n") }: _*)
    val joined = local.join(broadcast(offs), "__pid")
    val named = values.zip(vcols).foldLeft(joined) {
      case (d, ((_, out), (n, _))) =>
        d.withColumn(out, col(s"__lcum_$n") + col(s"__off_$n"))
    }
    val scratch = Seq("__pid") ++
      vcols.flatMap { case (n, _) => Seq(n, s"__lcum_$n", s"__off_$n") }
    named.drop(scratch: _*)
  }
}
