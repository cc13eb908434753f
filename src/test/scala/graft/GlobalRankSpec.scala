package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** Property tests for the two-level global rank/cumsum helpers: on
  * seeded random data (duplicates, skew, nulls-free keys) the
  * distributed results must equal the single-partition window truth,
  * for any partition count the range partitioner picks.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Long, n: Int): DataFrame = {
    val rng = new java.util.Random(seed)
    // duplicate-heavy scores force the tie-break column to matter;
    // id is unique so the full ordering key is total
    (0 until n).map(i => (i.toLong, rng.nextInt(40).toDouble,
      rng.nextInt(1000).toLong)).toDF("id", "score", "v")
  }

  test("globalRank equals single-partition row_number (desc score, id tiebreak)") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val df = randomDf(seed, 500)
      val got = GlobalRank.globalRank(df, "rnk",
          col("score").desc, col("id"))
        .select(col("id"), col("rnk"))
      val want = df.withColumn("rnk",
          row_number().over(Window.orderBy(col("score").desc, col("id")))
            .cast("long"))
        .select(col("id"), col("rnk"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"seed $seed: two-level rank diverged from window truth")
    }
  }

  test("globalRank assigns a contiguous 1..n permutation") {
    val df = randomDf(99L, 333)
    val ranks = GlobalRank.globalRank(df, "rnk", col("score"), col("id"))
      .select("rnk").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 333L))
  }

  test("globalRank under DUPLICATE ordering keys: exact rank blocks per key value") {
    // The ordering-key-uniqueness contract in the scaladoc is about
    // WITHIN-run determinism only. This pins what holds regardless:
    // with heavy duplicates (and no tiebreak column), every distinct
    // key value still receives exactly the same contiguous rank block
    // as the single-partition oracle — range partitioning cannot leak
    // a rank across a duplicate run, wherever the bounds fall.
    for (seed <- Seq(3L, 11L, 77L)) {
      val rng = new java.util.Random(seed)
      val n = 400 + rng.nextInt(200)
      // ~8 distinct values over hundreds of rows: maximal tie stress
      val df = (0 until n).map(i => (i.toLong, rng.nextInt(8).toDouble))
        .toDF("id", "score")
      val got = GlobalRank.globalRank(df, "rnk", col("score"))
      // permutation 1..n
      val ranks = got.select("rnk").as[Long].collect().sorted
      assert(ranks.toSeq === (1L to n.toLong), s"seed $seed: not a permutation")
      // per key value: the SET of ranks equals the oracle's block
      val gotBlocks = got.groupBy("score")
        .agg(min("rnk").as("lo"), max("rnk").as("hi"), count(lit(1)).as("c"))
        .collect().map(r => (r.getDouble(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val oracle = df.withColumn("rnk",
          row_number().over(Window.orderBy(col("score"))).cast("long"))
        .groupBy("score")
        .agg(min("rnk").as("lo"), max("rnk").as("hi"), count(lit(1)).as("c"))
        .collect().map(r => (r.getDouble(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(gotBlocks === oracle, s"seed $seed: rank blocks diverged")
      // contiguity inside each block: hi - lo + 1 == count
      gotBlocks.foreach { case (k, (lo, hi, c)) =>
        assert(hi - lo + 1 === c, s"seed $seed: block for $k not contiguous")
      }
    }
  }

  test("globalCumSum equals single-partition running sum") {
    for (seed <- Seq(3L, 11L)) {
      val df = randomDf(seed, 400)
      val got = GlobalRank.globalCumSum(df, col("v"), "cum", col("id"))
        .select(col("id"), col("cum"))
      val want = df.withColumn("cum",
          sum(col("v")).over(Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("id"), col("cum"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"seed $seed: two-level cumsum diverged from window truth")
    }
  }

  test("globalCumSums: two columns in one pass equal two window truths") {
    val df = randomDf(7L, 400).withColumn("v2", col("v") * 3L + 1L)
    val got = GlobalRank.globalCumSums(df,
        Seq(col("v") -> "cum_v", col("v2") -> "cum_v2"), col("id"))
      .select(col("id"), col("cum_v"), col("cum_v2"))
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum_v", sum(col("v")).over(w))
      .withColumn("cum_v2", sum(col("v2")).over(w))
      .select(col("id"), col("cum_v"), col("cum_v2"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "multi-value two-level cumsum diverged from window truth")
  }

  test("topKRanked returns exactly the global top-k, ranked 1..k") {
    val df = randomDf(5L, 250)
    val got = GlobalRank.topKRanked(df, 17, "rnk",
      col("score").desc, col("id")).select(col("id"), col("rnk"))
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("id")))
          .cast("long"))
      .filter(col("rnk") <= 17).select(col("id"), col("rnk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("globalRank plans no partitionBy-less window and a broadcast offset join") {
    val p = GlobalRank.globalRank(randomDf(1L, 100), "rnk", col("score"))
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"offset table must broadcast:\n$p")
  }
}
