package graft

import graft.functions.TopKByValue

/** Pins the bounded-heap top-k aggregator (q166): exactness vs a full
  * sort, merge-order invariance (the partial-aggregate contract), and
  * the O(k) state bound.
  */
class TopKAggSpec extends SparkSpec {

  private val agg = new TopKByValue(3)

  private def full(rows: Seq[(String, Double, Long)]): Seq[(Double, Long)] =
    rows.map(r => (r._2, r._3)).sortBy(t => (-t._1, t._2)).take(3)

  test("reduce stream equals sort-and-take on duplicate-heavy values") {
    for (seed <- Seq(5L, 13L, 99L)) {
      val rng = new scala.util.Random(seed)
      val rows = (1 to 500).map(i =>
        ("g", rng.nextInt(20).toDouble, i.toLong))
      val b = rows.foldLeft(agg.zero)(agg.reduce)
      assert(b.length === 3)
      assert(agg.finish(b) === full(rows), s"seed $seed")
    }
  }

  test("merge is order-invariant across arbitrary partition splits") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map(i => ("g", rng.nextInt(25).toDouble, i.toLong))
    val want = full(rows)
    for (splitSeed <- Seq(1, 2, 3)) {
      val r2 = new scala.util.Random(splitSeed)
      val parts = rows.groupBy(_ => r2.nextInt(8)).values.toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      // merge in shuffled order
      val merged = r2.shuffle(bufs).reduce(agg.merge)
      assert(agg.finish(merged) === want, s"split $splitSeed")
      assert(merged.length <= 3)
    }
  }

  test("below-k groups keep everything, ranked") {
    val rows = Seq(("g", 2.0, 10L), ("g", 9.0, 11L))
    val b = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) === Seq((9.0, 11L), (2.0, 10L)))
  }

  test("large k (k=64): stream + arbitrary merges equal sort-and-take") {
    // the binary-insert/two-pointer-merge rewrite only shows at k
    // beyond toy sizes: pin exactness and the state bound where the
    // old per-insert full sort would have dominated
    val k = 64
    val big = new TopKByValue(k)
    val rng = new scala.util.Random(42)
    val rows = (1 to 5000).map(i =>
      ("g", rng.nextInt(300).toDouble, i.toLong))
    val want = rows.map(r => (r._2, r._3)).sortBy(t => (-t._1, t._2)).take(k)
    val straight = rows.foldLeft(big.zero)(big.reduce)
    assert(straight.length === k)
    assert(big.finish(straight) === want)
    for (splitSeed <- Seq(11, 23)) {
      val r2 = new scala.util.Random(splitSeed)
      val parts = rows.groupBy(_ => r2.nextInt(13)).values.toSeq
      val bufs = parts.map(p => p.foldLeft(big.zero)(big.reduce))
      val merged = r2.shuffle(bufs).reduce(big.merge)
      assert(big.finish(merged) === want, s"split $splitSeed")
      assert(merged.length <= k)
    }
  }

  test("merge keeps legitimately equal values under distinct ids (no silent dedup)") {
    // ids are unique but VALUES collide: a (9.0, 1) in one partition
    // and (9.0, 2) in another must both survive a k=3 merge — the
    // round-5 `.distinct` would have been a no-op here, but this pins
    // that equal-value pairs are never conflated
    val a = Seq(("g", 9.0, 1L), ("g", 1.0, 5L)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(("g", 9.0, 2L), ("g", 9.0, 3L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b))
      === Seq((9.0, 1L), (9.0, 2L), (9.0, 3L)))
  }

  test("q166 plan: partial+final object aggregate, no rank window, no full sort") {
    val df = graft.operators.Relational
      .topCustomersAgg(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Window"), s"rank window leaked into UDAF top-k:\n$p")
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final typed aggregate:\n$p")
  }
}
