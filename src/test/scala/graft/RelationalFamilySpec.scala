package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalFamilySpec extends SparkSpec {
  import spark.implicits._

  private def withEventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)])
                           (f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("relfam").toString
    try {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("valuePercentiles: linear interpolation at (n-1)p, per group") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 5).map(i =>
      (i.toLong, t0, 1L, "click", i.toDouble, "{}")) :+
      (6L, t0, 1L, "view", 10.0, "{}")
    withEventsDir(rows) { dir =>
      val out = Relational.valuePercentiles(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("p50"),
            r.getAs[Double]("p90"), r.getAs[Double]("p99")))).toMap
      // click: sorted 1..5; idx(p)= (5-1)p -> p50=3, p90=4.6, p99=4.96
      val (n, p50, p90, p99) = out("click")
      assert(n === 5L && p50 === 3.0)
      assert(math.abs(p90 - 4.6) < 1e-12)
      assert(math.abs(p99 - 4.96) < 1e-12)
      assert(out("view") === ((1L, 10.0, 10.0, 10.0)))
    }
  }

  test("approx_percentile (the 100 TB path) lands in the exact percentile's neighborhood") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 1000).map(i => (i.toLong, t0, 1L, "click", i.toDouble, "{}"))
    withEventsDir(rows) { dir =>
      val exact = Relational.valuePercentiles(spark, dir)
        .filter(col("event_type") === "click").head().getAs[Double]("p50")
      val approx = spark.read.parquet(s"$dir/events.parquet")
        .agg(approx_percentile(col("value"), lit(0.5), lit(10000)).as("a"))
        .head().getAs[Double]("a")
      assert(math.abs(approx - exact) <= 1.0) // element-valued sketch, tight at this accuracy
    }
  }

  test("eventsCube: all four grouping sets, gid disambiguates NULL keys") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val rows = Seq(
      (1L, t0, 1L, "click", 1.0, "{}"),
      (2L, t0, 1L, "view", 2.0, "{}"),
      (3L, t1, 1L, "click", 4.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.eventsCube(spark, dir).collect()
      // 3 present (type, day) combos + 2 type subtotals + 2 day
      // subtotals + 1 grand total
      assert(out.length === 8)
      val byGid = out.groupBy(_.getAs[Long]("gid")).view.mapValues(_.length).toMap
      assert(byGid === Map(0L -> 3, 1L -> 2, 2L -> 2, 3L -> 1))
      val total = out.find(_.getAs[Long]("gid") == 3L).get
      assert(total.getAs[Long]("n_events") === 3L)
      assert(total.getAs[Double]("sum_value") === 7.0)
      // subtotal rows carry NULL in the aggregated-away key
      assert(out.filter(_.getAs[Long]("gid") == 1L)
        .forall(r => r.isNullAt(r.fieldIndex("day"))))
    }
  }

  test("followerCounts: bucketed range join counts strictly-following events in window") {
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))
    val rows = Seq(
      // user 1: chain crossing a bucket boundary (W=300s buckets)
      (1L, ts(0), 1L, "click", 0.0, "{}"),    // followers: 100, 299, 300 (<=300) -> 3
      (2L, ts(100), 1L, "click", 0.0, "{}"),  // followers: 299, 300, 400 -> 3
      (3L, ts(299), 1L, "click", 0.0, "{}"),  // followers: 300, 400 -> 2
      (4L, ts(300), 1L, "click", 0.0, "{}"),  // followers: 400, 600 -> 2
      (5L, ts(400), 1L, "click", 0.0, "{}"),  // followers: 600 -> 1
      (6L, ts(600), 1L, "click", 0.0, "{}"),  // followers: none -> 0 (zero survives)
      // user 2: same timestamp as user 1's head — must not cross users;
      // two equal timestamps must not count each other (strict >)
      (7L, ts(0), 2L, "view", 0.0, "{}"),
      (8L, ts(0), 2L, "view", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val df = Relational.followerCounts(spark, dir)
      val out = df.collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_follow")).toMap
      assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L,
        5L -> 1L, 6L -> 0L, 7L -> 0L, 8L -> 0L))
      // scale shape: the binning rewrite must yield an equi-join —
      // never a cartesian / broadcast nested loop per user
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"range join fell back to a nested loop:\n$plan")
    }
  }

  test("rateSpikes: RANGE frame skips gaps; spike = count > 3x trailing avg; no history = no spike") {
    def ts(min: Int, k: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(min * 60L + k))
    // clicks: minutes 0..4 at 1/min, a 4-event burst at minute 5 (full
    // trailing window 0..4 -> 4*5 > 5*3 -> spike), another burst at
    // minute 10 after a gap (frame 5..9 has only minute 5 observed ->
    // partial history, not a spike), and minute 12 (frame 7..11 =
    // minute 10 only -> partial, not a spike).
    var id = 0L
    def ev(min: Int, n: Int) = (0 until n).map { k =>
      id += 1; (id, ts(min, k), 1L, "click", 0.0, "{}")
    }
    val rows = (0 to 4).flatMap(m => ev(m, 1)) ++ ev(5, 4) ++
      ev(10, 4) ++ ev(12, 4)
    withEventsDir(rows) { dir =>
      val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
        .getEpochSecond / 60L
      val out = Relational.rateSpikes(spark, dir).collect()
        .map(r => (r.getAs[Long]("minute_us") / 60000000L - base).toInt ->
          ((r.getAs[Long]("n"), r.getAs[Long]("trail_n"),
            r.getAs[Boolean]("spike")))).toMap
      assert(out(1) === ((1L, 1L, false)))  // partial history
      assert(out(4) === ((1L, 4L, false)))  // partial history
      assert(out(5) === ((4L, 5L, true)))   // full window, 4 > 3x avg 1
      assert(out(10) === ((4L, 4L, false))) // gap -> partial history
      assert(out(12) === ((4L, 4L, false))) // gap -> partial history
    }
  }

  test("pricingRollup plan: Expand runs over the pre-aggregate, not the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("rollup").toString
    try {
      Seq(("A", "F", 1.0, 10.0, 0.1), ("A", "O", 2.0, 20.0, 0.0),
          ("R", "F", 3.0, 30.0, 0.2))
        .toDF("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val df = Relational.pricingRollup(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // two partial+final aggregations: the per-(flag,status) pre-agg
      // over the scan, then the rollup over its tiny output — the
      // Expand (3× multiplier) must sit ABOVE the first aggregate so
      // it never triples the fact-table rows
      assert("Exchange".r.findAllIn(plan).size === 2,
        s"expected pre-agg + rollup exchanges:\n$plan")
      assert(plan.contains("Expand"), "grouping sets expand missing")
      val expandInput = plan.linesIterator
        .dropWhile(l => !l.contains("Expand")).drop(1).next()
      assert(expandInput.contains("HashAggregate"),
        s"Expand must consume the pre-aggregate, not the scan:\n$plan")
      // grand total present exactly once
      val rows = df.collect()
      assert(rows.count(_.getAs[Long]("gid") == 3L) === 1)
      assert(rows.length === 3 + 2 + 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("latestState: latest event wins per (user, type); event_id breaks ts ties") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val rows = Seq(
      (1L, t0, 1L, "click", 1.0, "{}"),
      (2L, t1, 1L, "click", 2.0, "{}"), // latest by ts
      (3L, t1, 2L, "click", 3.0, "{}"),
      (4L, t1, 2L, "click", 4.0, "{}"), // ts tie -> higher event_id wins
      (5L, t0, 1L, "view", 5.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.latestState(spark, dir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
          ((r.getAs[Long]("last_event_id"), r.getAs[Double]("last_value"))))
        .toMap
      assert(out.size === 3)
      assert(out((1L, "click")) === ((2L, 2.0)))
      assert(out((2L, "click")) === ((4L, 4.0)))
      assert(out((1L, "view")) === ((5L, 5.0)))
    }
  }

  test("latestState plan: aggregate with map-side partials, not a window sort") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    withEventsDir(Seq((1L, t0, 1L, "click", 1.0, "{}"))) { dir =>
      val plan = Relational.latestState(spark, dir)
        .queryExecution.executedPlan.toString
      // compaction must reduce BEFORE the shuffle: a partial_max below
      // the Exchange (struct max buffers immutably, so Spark picks
      // SortAggregate — the map-side combine is what matters), and no
      // Window over the raw log
      assert(!plan.contains("Window"), s"window formulation shuffles+sorts the whole log:\n$plan")
      assert(plan.contains("partial_max"), s"expected map-side partial aggregate:\n$plan")
    }
  }

  test("zkey interleaves bits: a on even positions, b on odd") {
    val df = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
    val out = df.select(Relational.zkey(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(out(0) === 7L)            // a=0b11 -> bits 0,2; b=0b1 -> bit 1
    assert(out(1) === 0L)
    assert(out(2) === 0x55555555L)   // all-even mask
    assert(out(3) === 0xAAAAAAAAL)   // all-odd mask
  }

  test("zorderLayout: every z-bucket bounds BOTH dimensions' high bits") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // a grid spanning both dims so buckets see distinct corners
    val rows = for (u <- 0 until 32; m <- 0 until 16) yield
      ((u * 16 + m).toLong, new java.sql.Timestamp(t0 + m * 60000L * 1024),
        u.toLong * 2048, "click", 1.0, "{}")
    withEventsDir(rows) { dir =>
      val out = Relational.zorderLayout(spark, dir).collect()
      assert(out.map(_.getAs[Long]("n")).sum === rows.length)
      // bucket = interleave of each dim's top 3 bits, so within a
      // bucket each dim's value>>13 is constant — the bounded min/max
      // envelope multi-dimensional data skipping prunes against
      out.foreach { r =>
        assert(r.getAs[Long]("u_min") >> 13 === r.getAs[Long]("u_max") >> 13)
        assert(r.getAs[Long]("m_min") >> 13 === r.getAs[Long]("m_max") >> 13)
      }
    }
  }

  test("forwardFill: purchase value carried forward, null before first purchase") {
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (1L, t(0), 1L, "click", 1.0, "{}"),
      (2L, t(1), 1L, "purchase", 5.0, "{}"),
      (3L, t(2), 1L, "view", 9.0, "{}"),
      (4L, t(1), 2L, "click", 2.0, "{}")) // other user: never purchases
    withEventsDir(rows) { dir =>
      val out = Relational.forwardFill(spark, dir).collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("last_purchase_value"))).toMap
      assert(out(1L) === None)        // before first purchase
      assert(out(2L) === Some(5.0))   // the purchase itself
      assert(out(3L) === Some(5.0))   // carried forward
      assert(out(4L) === None)        // user 2 never purchased
    }
  }

  test("pivot/unpivot round trip: wide columns coalesce to 0; melt equals the long aggregate") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0, 1L, "click", 1.0, "{}"),
      (2L, t0, 1L, "click", 1.0, "{}"),
      (3L, t0, 1L, "view", 1.0, "{}"),
      (4L, t0, 2L, "error", 1.0, "{}"))
    withEventsDir(rows) { dir =>
      val wide = Relational.pivotCounts(spark, dir).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_click"), r.getAs[Long]("n_view"),
            r.getAs[Long]("n_error")))).toMap
      assert(wide(1L) === ((2L, 1L, 0L)))
      assert(wide(2L) === ((0L, 0L, 1L)))
      val long = Relational.unpivotCounts(spark, dir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("n")).toMap
      assert(long === Map((1L, "click") -> 2L, (1L, "view") -> 1L,
        (2L, "error") -> 1L))
    }
  }

  test("rankFunctions: ties share rank/percent_rank/cume_dist; ntile is total-order stable") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0, 1L, "click", 0.0, """{"k": 1}"""),
      (2L, t0, 1L, "click", 0.0, """{"k": 1}"""),
      (3L, t0, 1L, "click", 0.0, """{"k": 2}"""))
    withEventsDir(rows) { dir =>
      val out = Relational.rankFunctions(spark, dir).collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Int]("rnk"), r.getAs[Int]("drnk"),
            r.getAs[Double]("prnk"), r.getAs[Double]("cd"),
            r.getAs[Int]("tile")))).toMap
      assert(out(1L) === ((1, 1, 0.0, 2.0 / 3, 1)))
      assert(out(2L) === ((1, 1, 0.0, 2.0 / 3, 2)))
      assert(out(3L) === ((3, 2, 1.0, 1.0, 3)))
    }
  }

  test("scd2Intervals: contiguous [from,to) intervals; current row open; q55 snapshot = open rows") {
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (1L, t(0), 1L, "click", 1.0, "{}"),
      (2L, t(5), 1L, "click", 2.0, "{}"),
      (3L, t(9), 1L, "click", 3.0, "{}"),
      (4L, t(2), 2L, "view", 4.0, "{}"))
    withEventsDir(rows) { dir =>
      val iv = Relational.scd2Intervals(spark, dir).collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Long]("valid_from"), Option(r.getAs[java.lang.Long]("valid_to")))))
        .toMap
      assert(iv(1L)._2 === Some(iv(2L)._1)) // contiguous
      assert(iv(2L)._2 === Some(iv(3L)._1))
      assert(iv(3L)._2 === None)            // open current row
      assert(iv(4L)._2 === None)
      // the open rows ARE the q55 latest snapshot
      val open = Relational.scd2Intervals(spark, dir)
        .filter(col("valid_to").isNull)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("last_event_id")).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("last_event_id")).toMap
      val latest = Relational.latestState(spark, dir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("last_event_id")).toMap
      assert(open === latest)
    }
  }

  test("valueHistogram: floor-width buckets, negatives included") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq((1L, t0, 1L, "click", 0.0, "{}"),
      (2L, t0, 1L, "click", 4.99, "{}"),
      (3L, t0, 1L, "click", 5.0, "{}"),
      (4L, t0, 1L, "click", -0.01, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.valueHistogram(spark, dir).collect()
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
      assert(out === Map(0L -> 2L, 1L -> 1L, -1L -> 1L))
    }
  }

  test("momentStats: hand-computed mean/variance/correlation from exact power sums") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // x = (1,2,3), y = (2,4,6): perfectly correlated
    val rows = Seq(
      (1L, t0, 1L, "click", 1.0, """{"k": 2}"""),
      (2L, t0, 1L, "click", 2.0, """{"k": 4}"""),
      (3L, t0, 1L, "click", 3.0, """{"k": 6}"""),
      (4L, t0, 1L, "view", 7.0, """{"k": 1}"""))
    withEventsDir(rows) { dir =>
      val out = Relational.momentStats(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("mean_value"),
            r.getAs[Double]("var_value"), r.getAs[Double]("corr_vk")))).toMap
      val (n, mean, varp, corr) = out("click")
      assert(n === 3L && mean === 2.0)
      assert(math.abs(varp - 2.0 / 3) < 1e-12)
      assert(math.abs(corr - 1.0) < 1e-12)
      assert(out("view")._2 === 7.0)
    }
  }

  test("peakConcurrency: per-day sweep with midnight-spanning session") {
    // day0: u1 session [0s,10s], u2 session [5s,5s] (peak 2 at t=5s),
    // u4 session 23:59 -> day1 00:10 (spans midnight, clipped to both
    // days); day2: u3 alone.
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 00:00:10"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 00:00:05"), 2L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 23:59:00"), 4L, "click", 0.0, "{}"),
      (5L, ts("2024-01-02 00:10:00"), 4L, "click", 0.0, "{}"),
      (6L, ts("2024-01-03 12:00:00"), 3L, "click", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.peakConcurrency(spark, dir).collect()
        .map(r => r.getAs[Long]("day") ->
          ((r.getAs[Long]("n_sessions"), r.getAs[Long]("peak_concurrency"))))
        .toMap
      val day0 = out.keys.min
      assert(out(day0) === ((3L, 2L)))
      assert(out(day0 + 1) === ((1L, 1L)))
      assert(out(day0 + 2) === ((1L, 1L)))
      assert(out.size === 3)
    }
  }

  test("userGrowth + retentionCohorts: first-day attribution, integer running sum") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 2L, "view", 0.0, "{}"),
      (4L, ts("2024-01-02 12:00:00"), 3L, "click", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val g = Relational.userGrowth(spark, dir).collect()
        .map(r => r.getAs[Long]("day") ->
          ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
            r.getAs[Long]("n_returning"), r.getAs[Long]("cum_users")))).toMap
      val d0 = g.keys.min
      assert(g(d0) === ((2L, 2L, 0L, 2L)))
      assert(g(d0 + 1) === ((2L, 1L, 1L, 3L)))
      val rc = Relational.retentionCohorts(spark, dir).collect()
        .map(r => (r.getAs[Long]("cohort_day") - d0,
          r.getAs[Long]("day_offset"), r.getAs[Long]("n_active"))).toSet
      assert(rc === Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L)))
    }
  }

  test("funnel: strictly ordered stages, missing stage breaks the chain") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // u1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 0.0, "{}"),
      // u2: click BEFORE signup, purchase after — chain broken at click
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 0.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0, "{}"),
      (6L, ts("2024-01-01 11:00:00"), 2L, "purchase", 0.0, "{}"),
      // u3: signup only; u4: no signup at all
      (7L, ts("2024-01-01 10:00:00"), 3L, "signup", 0.0, "{}"),
      (8L, ts("2024-01-01 10:00:00"), 4L, "click", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.funnel(spark, dir).collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getAs[Long]("n_signup") === 3L)
      assert(r.getAs[Long]("n_click") === 1L)
      assert(r.getAs[Long]("n_purchase") === 1L)
    }
  }

  test("winsorizedStats: p01/p99 clamp then exact moments") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val vals = Seq(0.0, 10.0, 20.0, 30.0, 1000.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, t0, 1L, "click", v, "{}") }
    withEventsDir(rows) { dir =>
      val r = Relational.winsorizedStats(spark, dir).collect().head
      // p01 = 0 + 0.04*10 = 0.4; p99 = 30 + 0.96*970 = 961.2
      assert(math.abs(r.getAs[Double]("p01") - 0.4) < 1e-12)
      assert(math.abs(r.getAs[Double]("p99") - 961.2) < 1e-12)
      val clamped = vals.map(v => math.max(0.4, math.min(961.2, v)))
      val mean = clamped.sum / clamped.length
      val varW = clamped.map(x => x * x).sum / clamped.length - mean * mean
      assert(math.abs(r.getAs[Double]("mean_w") - mean) < 1e-9)
      assert(math.abs(r.getAs[Double]("var_w") - varW) < 1e-6)
    }
  }

  test("activityStreaks: islands split on gaps; madStats: robust spread") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // u1 active days {1,2,3, 6,7}; u2 active {10}
    val dayRows = Seq(1, 2, 3, 6, 7).zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, ts(f"2024-01-$d%02d 09:00:00"), 1L, "click", 0.0, "{}")
    } :+ ((9L, ts("2024-01-10 09:00:00"), 2L, "view", 0.0, "{}"))
    withEventsDir(dayRows) { dir =>
      val st = Relational.activityStreaks(spark, dir).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
            r.getAs[Long]("longest_streak")))).toMap
      assert(st(1L) === ((5L, 2L, 3L)))
      assert(st(2L) === ((1L, 1L, 1L)))
    }
    val madRows = (1 to 5).map(i =>
      (i.toLong, ts("2024-01-01 00:00:00"), 1L, "click", i.toDouble, "{}"))
    withEventsDir(madRows) { dir =>
      val r = Relational.madStats(spark, dir).collect().head
      assert(r.getAs[Long]("n") === 5L)
      assert(r.getAs[Double]("med") === 3.0)
      assert(r.getAs[Double]("mad") === 1.0)
    }
  }

  test("kmvSetOps: unsaturated sketches give exact union/intersection") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // click users 1-10; view users 5-15: union 15, inter 6
    val rows = (1 to 10).map(u =>
      (u.toLong, t0, u.toLong, "click", 0.0, "{}")) ++
      (5 to 15).map(u => (100L + u, t0, u.toLong, "view", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val r = Relational.kmvSetOps(spark, dir).collect().head
      assert(r.getAs[Long]("exact_union") === 15L)
      assert(r.getAs[Long]("exact_inter") === 6L)
      // below saturation the sketch is the full set: estimates exact
      assert(r.getAs[Double]("est_union") === 15.0)
      assert(r.getAs[Double]("est_inter") === 6.0)
    }
  }

  test("debounce drops raw-gap repeats; zscore matches hand stats") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val at = (sec: Int) => new java.sql.Timestamp(base + sec * 1000L)
    val rows = Seq(
      (1L, at(0), 1L, "click", 0.0, "{}"),
      (2L, at(2), 1L, "click", 0.0, "{}"),   // 2s  < 5s -> dropped
      (3L, at(7), 1L, "click", 0.0, "{}"),   // 5s gap from RAW #2 -> kept
      (4L, at(8), 1L, "click", 0.0, "{}"),   // 1s -> dropped
      (5L, at(20), 1L, "click", 0.0, "{}"))  // kept
    withEventsDir(rows) { dir =>
      val kept = Relational.debounce(spark, dir).collect()
        .map(_.getAs[Long]("event_id")).toSet
      assert(kept === Set(1L, 3L, 5L))
    }
    val zrows = (1 to 5).map(i =>
      (i.toLong, at(0), 1L, "click", i.toDouble, "{}"))
    withEventsDir(zrows) { dir =>
      val z = Relational.zscore(spark, dir).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z")).toMap
      assert(math.abs(z(1L) + math.sqrt(2.0)) < 1e-12) // (1-3)/sqrt(2)
      assert(math.abs(z(3L)) < 1e-12)
    }
  }

  test("chiSquareCells: expected counts from row/col totals") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("chisq").toString
    try {
      val ev = (1 to 30).map(i => (i.toLong, t0, 1L, "click", 0.0, "{}")) ++
        (31 to 40).map(i => (i.toLong, t0, 2L, "click", 0.0, "{}")) ++
        (41 to 50).map(i => (i.toLong, t0, 1L, "view", 0.0, "{}")) ++
        (51 to 60).map(i => (i.toLong, t0, 2L, "view", 0.0, "{}"))
      ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      Seq((1L, "n1", 1, 0.0, "A"), (2L, "n2", 1, 0.0, "B"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val out = Relational.chiSquareCells(spark, dir).collect()
        .map(r => (r.getAs[String]("event_type"),
          r.getAs[String]("c_mktsegment")) ->
          ((r.getAs[Long]("o"), r.getAs[Double]("e")))).toMap
      // rt(click)=40 ct(A)=40 n=60 -> e = 26.666...
      val (o, e) = out(("click", "A"))
      assert(o === 30L && math.abs(e - 40.0 * 40 / 60) < 1e-12)
      assert(out(("view", "B"))._1 === 10L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("groupingSetsCounts gid bits; columnStats one-pass stats") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 02:00:00"), 1L, "view", 3.0, "{}"),
      (3L, ts("2024-01-02 01:00:00"), 2L, "click", 3.0, "{}"))
    withEventsDir(rows) { dir =>
      val gs = Relational.groupingSetsCounts(spark, dir).collect()
      // sets: (type)x2 + (day)x2 + ()x1 = 5 rows; no (type,day) cells
      assert(gs.length === 5)
      assert(gs.count(_.getAs[Long]("gid") == 1L) === 2) // by type
      assert(gs.count(_.getAs[Long]("gid") == 2L) === 2) // by day
      val tot = gs.find(_.getAs[Long]("gid") == 3L).get
      assert(tot.getAs[Long]("n_events") === 3L)
      val cs = Relational.columnStats(spark, dir).collect()
        .map(r => r.getAs[String]("col_name") -> r).toMap
      val v = cs("value")
      assert(v.getAs[Long]("n") === 3L && v.getAs[Long]("n_null") === 0L)
      assert(v.getAs[Long]("ndv") === 2L)
      assert(v.getAs[Double]("min_d") === 1.0 && v.getAs[Double]("max_d") === 3.0)
      assert(cs("event_type").isNullAt(cs("event_type").fieldIndex("min_d")))
    }
  }

  test("equiDepth tiles, cooccurrence pairs, conversion latency") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val t0 = ts("2024-01-01 00:00:00")
    withEventsDir((1 to 8).map(i =>
      (i.toLong, t0, 1L, "click", i.toDouble, "{}"))) { dir =>
      val ed = Relational.equiDepthHistogram(spark, dir).collect()
        .map(r => r.getAs[Int]("tile") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("lo"),
            r.getAs[Double]("hi")))).toMap
      assert(ed(1) === ((2L, 1.0, 2.0)) && ed(4) === ((2L, 7.0, 8.0)))
    }
    withEventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 15:00:00"), 1L, "view", 0.0, "{}"),      // new session
      (4L, ts("2024-01-01 15:10:00"), 1L, "purchase", 0.0, "{}"))) { dir =>
      val co = Relational.typeCooccurrence(spark, dir).collect()
        .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
          r.getAs[Long]("n_sessions"))).toSet
      assert(co === Set(("click", "view", 1L), ("purchase", "view", 1L)))
    }
    withEventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:01:40"), 1L, "purchase", 0.0, "{}"),  // lat 100s
      (4L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0, "{}"),
      (5L, ts("2024-01-01 10:01:00"), 2L, "click", 0.0, "{}"),
      (6L, ts("2024-01-01 10:03:20"), 2L, "purchase", 0.0, "{}"))) { dir => // 200s
      val r = Relational.conversionLatency(spark, dir).collect().head
      assert(r.getAs[Long]("n_converted") === 2L)
      assert(r.getAs[Double]("p50_us") === 150e6)
      assert(r.getAs[Double]("p90_us") === 190e6)
    }
  }

  test("shareOfParent shares sum to 1; sessionPaths ordered strings") {
    val dir = java.nio.file.Files.createTempDirectory("shareofp").toString
    try {
      Seq((1L, 1L, 1L, 1, 100.0, 0.0), (2L, 2L, 2L, 1, 300.0, 0.0))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_extendedprice", "l_discount")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Seq((1L, 1L), (2L, 2L)).toDF("s_suppkey", "s_nationkey")
        .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      Seq((1L, "n1", 1L), (2L, "n2", 1L))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      Seq((1L, "r1")).toDF("r_regionkey", "r_name")
        .write.mode("overwrite").parquet(s"$dir/region.parquet")
      val out = Relational.shareOfParent(spark, dir).collect()
        .map(r => r.getAs[String]("n_name") ->
          ((r.getAs[Double]("revenue"), r.getAs[Double]("share_of_region"))))
        .toMap
      assert(out("n1") === ((100.0, 0.25)) && out("n2") === ((300.0, 0.75)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    withEventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 15:00:00"), 1L, "view", 0.0, "{}"),
      (4L, ts("2024-01-01 15:10:00"), 1L, "purchase", 0.0, "{}"))) { dir =>
      val paths = Relational.sessionPaths(spark, dir).collect()
        .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions"))
        .toMap
      assert(paths === Map("click>view" -> 1L, "view>purchase" -> 1L))
    }
  }

  test("weekOverWeek pct change; paretoConcentration 80% cover count") {
    val dir = java.nio.file.Files.createTempDirectory("wowpar").toString
    try {
      val ts = (s: String) => java.sql.Timestamp.valueOf(s)
      // two ISO weeks: rev 100 then 150
      Seq((1L, 1L, "O", 100.0, ts("2024-01-01 00:00:00"), "p"),
          (2L, 2L, "O", 150.0, ts("2024-01-08 00:00:00"), "p"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Seq((1L, "n1", 1, 0.0, "A"), (2L, "n2", 1, 0.0, "A"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val wow = Relational.weekOverWeek(spark, dir).collect()
        .map(r => r.getAs[String]("week") ->
          Option(r.get(r.fieldIndex("pct_change")))).toMap
      assert(wow("2024-01-01") === None)
      assert(wow("2024-01-08") === Some(0.5))
      // seg A spends: c2=150, c1=100; total 250; c2 cum 150:
      // 150*5=750 < 4*250=1000 -> below80; n_top80 = 2
      val par = Relational.paretoConcentration(spark, dir).collect().head
      assert(par.getAs[String]("c_mktsegment") === "A")
      assert(par.getAs[Long]("n_customers") === 2L)
      assert(par.getAs[Long]("n_top80") === 2L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("linearInterpolate: midpoint value, exact at observations, null outside") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val at = (sec: Int) => new java.sql.Timestamp(base + sec * 1000L)
    val rows = Seq(
      (1L, at(0), 1L, "purchase", 10.0, "{}"),
      (2L, at(25), 1L, "click", 0.0, "{}"),    // 1/4 of the way: 12.5
      (3L, at(100), 1L, "purchase", 20.0, "{}"),
      (4L, at(150), 1L, "click", 0.0, "{}"),   // after last obs: null
      (5L, at(-50), 1L, "view", 0.0, "{}"))    // before first obs: null
    withEventsDir(rows) { dir =>
      val out = Relational.linearInterpolate(spark, dir).collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.get(r.fieldIndex("v_interp")))).toMap
      assert(out(1L) === Some(10.0) && out(3L) === Some(20.0))
      assert(out(2L) === Some(12.5))
      assert(out(4L) === None && out(5L) === None)
    }
  }

  test("saltedSegmentActivity equals the plain join rollup") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("salted").toString
    try {
      // user 1 is the hot key
      val ev = (1 to 50).map(i => (i.toLong, t0, 1L, "click", i.toDouble, "{}")) ++
        Seq((51L, t0, 2L, "view", 5.0, "{}"), (52L, t0, 3L, "view", 7.0, "{}"))
      ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      Seq((1L, "n1", 1, 0.0, "BUILDING"), (2L, "n2", 1, 0.0, "AUTOMOBILE"),
          (3L, "n3", 2, 0.0, "BUILDING"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val out = Relational.saltedSegmentActivity(spark, dir).collect()
        .map(r => r.getAs[String]("c_mktsegment") ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
            r.getAs[Long]("n_users")))).toMap
      assert(out("BUILDING") === ((51L, (1 to 50).map(_.toDouble).sum + 7.0, 2L)))
      assert(out("AUTOMOBILE") === ((1L, 5.0, 1L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("olsRegression: exact fit recovers slope/intercept, r2=1; constant x -> nulls") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // click: y = 2k + 1 exactly (integers — decimal quantization exact)
    val fit = (1 to 10).map(i =>
      (i.toLong, t0, 1L, "click", 2.0 * i + 1, s"""{"k": $i}"""))
    // view: constant x=5 — zero x-variance, slope/intercept/r2 null
    val const = (11 to 13).map(i =>
      (i.toLong, t0, 1L, "view", i.toDouble, """{"k": 5}"""))
    // error: no k at all — filtered out entirely
    val nok = Seq((14L, t0, 1L, "error", 1.0, "{}"))
    withEventsDir(fit ++ const ++ nok) { dir =>
      val rows = Relational.olsRegression(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r).toMap
      assert(!rows.contains("error"))
      val c = rows("click")
      assert(c.getAs[Long]("n") === 10L)
      assert(math.abs(c.getAs[Double]("slope") - 2.0) < 1e-9)
      assert(math.abs(c.getAs[Double]("intercept") - 1.0) < 1e-9)
      assert(math.abs(c.getAs[Double]("r2") - 1.0) < 1e-12)
      val v = rows("view")
      assert(v.isNullAt(v.fieldIndex("slope")) && v.isNullAt(v.fieldIndex("r2")))
    }
  }

  test("ohlcResample: endpoint argmin/argmax deterministic under timestamp ties") {
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 05:00:00")
    def at(sec: Int) = new java.sql.Timestamp(h0.getTime + sec * 1000L)
    // two events share the opening timestamp: event_id breaks the tie
    val rows = Seq(
      (2L, at(0), 1L, "click", 30.0, "{}"),
      (1L, at(0), 1L, "click", 10.0, "{}"),   // open (same ts, lower id)
      (3L, at(60), 1L, "click", 99.0, "{}"),  // high
      (4L, at(120), 1L, "click", 5.0, "{}"),  // low + close
      (5L, at(4000), 1L, "click", 42.0, "{}")) // next hour bucket
    withEventsDir(rows) { dir =>
      val out = Relational.ohlcResample(spark, dir).collect()
        .map(r => r.getAs[Long]("hour_us") -> r).toMap
      assert(out.size === 2)
      val first = out.minBy(_._1)._2
      assert(first.getAs[Long]("n_events") === 4L)
      assert(first.getAs[Double]("px_open") === 10.0)
      assert(first.getAs[Double]("px_high") === 99.0)
      assert(first.getAs[Double]("px_low") === 5.0)
      assert(first.getAs[Double]("px_close") === 5.0)
      assert(first.getAs[Double]("sum_value") === 144.0)
      val second = out.maxBy(_._1)._2
      assert(second.getAs[Double]("px_open") === 42.0 &&
        second.getAs[Double]("px_close") === 42.0)
    }
  }

  test("madAnomalies: flags only the planted outlier; MAD=0 group flags nothing") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // click: tight cluster around 10 plus one wild point
    val base = (1 to 20).map(i =>
      (i.toLong, t0, 1L, "click", 10.0 + (i % 5) * 0.1, "{}"))
    val outlier = Seq((21L, t0, 1L, "click", 1000.0, "{}"))
    // view: all-identical values -> MAD 0 -> null mz, excluded
    val flat = (22 to 30).map(i => (i.toLong, t0, 1L, "view", 7.0, "{}"))
    withEventsDir(base ++ outlier ++ flat) { dir =>
      val out = Relational.madAnomalies(spark, dir).collect()
      assert(out.length === 1)
      assert(out.head.getAs[Long]("event_id") === 21L)
      assert(out.head.getAs[String]("event_type") === "click")
      assert(math.abs(out.head.getAs[Double]("mz")) > 3.5)
    }
  }

  test("touchAttribution: endpoints on the (t_us, event_id) total order; purchases never credit") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: view(1) -> click(2) -> purchase(3) -> click(4, after conv)
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 00:02:00"), 1L, "purchase", 9.0, "{}"),
      (4L, ts("2024-01-01 00:03:00"), 1L, "click", 0.0, "{}"),
      // user 2: two touches at the SAME timestamp as the conversion
      // instant minus tie on event_id: 5 counts (id < conv id), 7 does
      // not (id > conv id); first touch = error(5) by event_id tie
      (5L, ts("2024-02-01 00:00:00"), 2L, "error", 0.0, "{}"),
      (6L, ts("2024-02-01 00:00:00"), 2L, "purchase", 1.0, "{}"),
      (7L, ts("2024-02-01 00:00:00"), 2L, "view", 0.0, "{}"),
      // user 3: purchase only - no touches, drops out
      (8L, ts("2024-03-01 00:00:00"), 3L, "purchase", 1.0, "{}"),
      // user 4: touches but never converts - drops out
      (9L, ts("2024-03-02 00:00:00"), 4L, "view", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.touchAttribution(spark, dir).collect()
        .map(r => r.getAs[String]("channel") ->
          ((r.getAs[Long]("n_first"), r.getAs[Long]("n_last")))).toMap
      // user 1: first=view, last=click (event 4 is post-conversion)
      // user 2: only event 5 qualifies -> first=last=error
      assert(out === Map(
        "view" -> ((1L, 0L)),
        "click" -> ((0L, 1L)),
        "error" -> ((1L, 1L))))
    }
  }

  test("constraintAudit: counts every violation class on a dirty fixture") {
    val dir = java.nio.file.Files.createTempDirectory("audit").toString
    try {
      val d0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      // orders: 1 null price, 1 non-positive price, 1 null date,
      // orderkey 10 duplicated, custkey 99 orphaned.
      Seq(
        (10L, 1L, Some(5.0), Some(d0)),
        (10L, 1L, Some(-1.0), Some(d0)),
        (11L, 2L, None: Option[Double], Some(d0)),
        (12L, 99L, Some(7.0), None: Option[java.sql.Timestamp]))
        .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .write.parquet(s"$dir/orders.parquet")
      // lineitem: qty 0 and 51 out of range, discount 1.5 out of range,
      // (orderkey, linenumber) (10,1) duplicated, orderkey 77 orphaned.
      Seq(
        (10L, 1, 0.0, 0.1),
        (10L, 1, 51.0, 0.2),
        (11L, 1, 5.0, 1.5),
        (77L, 1, 5.0, 0.0))
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .write.parquet(s"$dir/lineitem.parquet")
      Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
        .write.parquet(s"$dir/customer.parquet")

      val out = Relational.constraintAudit(spark, dir).collect()
        .map(r => r.getAs[String]("constraint") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
            r.getAs[Long]("pass")))).toMap
      assert(out === Map(
        "orders.totalprice_positive" -> ((4L, 2L, 0L)),
        "orders.orderdate_not_null" -> ((4L, 1L, 0L)),
        "lineitem.quantity_1_50" -> ((4L, 2L, 0L)),
        "lineitem.discount_0_1" -> ((4L, 1L, 0L)),
        "orders.orderkey_unique" -> ((4L, 1L, 0L)),
        "lineitem.order_line_unique" -> ((4L, 1L, 0L)),
        "orders.custkey_fk" -> ((4L, 1L, 0L)),
        "lineitem.orderkey_fk" -> ((4L, 1L, 0L))))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bootstrapCi: deterministic, weights are mean-1-ish, CI brackets the sample mean") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.operators.Relational.bootstrapCi(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean_value"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))).toMap
    val a = run()
    // bit-identical across invocations — the weights are hash-derived,
    // not RNG-derived
    assert(a === run())
    assert(a.nonEmpty)
    a.foreach { case (typ, (n, mean, lo, hi)) =>
      assert(n > 0, typ)
      assert(lo <= hi, s"$typ: lo $lo > hi $hi")
      // the bootstrap distribution re-centers on the sample mean; at
      // n >= 50 the 2nd/39th order statistics bracket it
      assert(lo <= mean && mean <= hi, s"$typ: $mean outside [$lo, $hi]")
      // and the interval is non-degenerate: resampling variance exists
      assert(hi > lo, typ)
    }
    // Poisson(1) weight sanity on the raw mechanism: over all rows and
    // replicates the mean weight is ~1 (thresholds correctly scaled),
    // and the weight VARIES across replicates of the same row (the
    // scramble actually decorrelates — raw polyHash on short strings
    // is affine in the replicate id and fails this)
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id")).limit(500)
      .withColumn("_u0", graft.functions.TextHash.polyHash(
        col("event_id").cast("string")))
      .withColumn("b", explode(sequence(lit(0), lit(9))))
      .withColumn("w", graft.operators.Relational
        .bootstrapWeight(col("_u0"), col("b")))
    val mw = ev.select(avg(col("w"))).head().getDouble(0)
    assert(mw > 0.85 && mw < 1.15, s"mean Poisson weight $mw far from 1")
    val perRow = ev.groupBy("event_id")
      .agg(countDistinct(col("w")).as("nw"))
    val varied = perRow.filter(col("nw") >= 2).count().toDouble /
      perRow.count()
    assert(varied > 0.9, s"only ${varied * 100}%% of rows vary across replicates")
  }

  test("abWelch: A/A by construction — balanced arms, finite sane statistics, deterministic") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.operators.Relational.abWelch(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("t_stat"), r.getAs[Double]("dof")))).toMap
    val a = run()
    assert(a === run()) // hash assignment, not RNG
    assert(a.nonEmpty)
    a.foreach { case (typ, (na, nb, t, dof)) =>
      // hash balance: neither arm may collapse (binomial far tail)
      assert(na > 0 && nb > 0, typ)
      val frac = na.toDouble / (na + nb)
      assert(frac > 0.3 && frac < 0.7, s"$typ: arm imbalance $frac")
      // A/A: same distribution in both arms — |t| in a sane range
      // (|t| > 6 would be a broken assignment or broken statistic)
      assert(!t.isNaN && math.abs(t) < 6.0, s"$typ: t=$t")
      // Welch dof lies in [min(n)-1, n_a+n_b-2]
      assert(dof >= math.min(na, nb) - 1 && dof <= na + nb - 2,
        s"$typ: dof $dof outside bounds")
    }
  }

  test("transitionMining: bigram counts, user support, conditional shares") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: click,view,click,purchase; u2: click,view
    val rows = Seq(
      (1L, ts(1), 1L, "click", 0.0, "{}"), (2L, ts(2), 1L, "view", 0.0, "{}"),
      (3L, ts(3), 1L, "click", 0.0, "{}"), (4L, ts(4), 1L, "purchase", 0.0, "{}"),
      (5L, ts(1), 2L, "click", 0.0, "{}"), (6L, ts(2), 2L, "view", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.transitionMining(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_users"),
            r.getAs[Double]("p_next")))).toMap
      assert(out === Map(
        ("click", "view") -> ((2L, 2L, 2.0 / 3)),
        ("click", "purchase") -> ((1L, 1L, 1.0 / 3)),
        ("view", "click") -> ((1L, 1L, 1.0))))
    }
  }

  test("driftAudit: halves split at the integer midpoint, bins clamp, shares add up") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"), (2L, ts(0), 1L, "click", 10.0, "{}"),
      (3L, ts(10), 1L, "click", 0.0, "{}"), (4L, ts(10), 1L, "click", 5.0, "{}"),
      (5L, ts(10), 1L, "click", 10.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.driftAudit(spark, dir).collect()
        .map(r => r.getAs[Long]("bin") ->
          ((r.getAs[Long]("n_first"), r.getAs[Long]("n_second"),
            r.getAs[Double]("abs_diff")))).toMap
      // mid = 00:05 -> first half rows at 00:00; v=10 clamps to bin 9
      assert(out.keySet === Set(0L, 5L, 9L))
      assert(out(0L)._1 === 1L && out(0L)._2 === 1L)
      assert(out(5L)._1 === 0L && out(5L)._2 === 1L)
      assert(math.abs(out(0L)._3 - (0.5 - 1.0 / 3)) < 1e-12)
      assert(math.abs(out(5L)._3 - 1.0 / 3) < 1e-12)
      assert(math.abs(out(9L)._3 - (0.5 - 1.0 / 3)) < 1e-12)
    }
  }

  test("ltvCohorts: hand-checked cohort x age triangle") {
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    try {
      val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
      Seq((1L, 1L, "O", 100.0, ts("2024-01-05"), "p"),
          (2L, 1L, "O", 50.0, ts("2024-03-20"), "p"),
          (3L, 2L, "O", 10.0, ts("2024-01-30"), "p"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = Relational.ltvCohorts(spark, dir).collect()
        .map(r => (r.getString(0), r.getAs[Long]("age_months")) ->
          ((r.getAs[Long]("n_customers"), r.getAs[Long]("n_orders"),
            r.getAs[Double]("revenue")))).toMap
      assert(out === Map(
        ("2024-01", 0L) -> ((2L, 2L, 110.0)),
        ("2024-01", 2L) -> ((1L, 1L, 50.0))))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("purgeAudit: counts partition each table; mass matches a re-derived flag") {
    val dir = "/root/testdata/sf0.001"
    val out = Relational.purgeAudit(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_purged"), r.getAs[Long]("n_retained"),
          r.getAs[Double]("purged_value")))).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val flag = Relational.scrambleMod(graft.functions.TextHash.polyHash(
      concat(lit("del:"), col("user_id").cast("string")))) % 20 === 0L
    val expPurged = ev.filter(flag).count()
    assert(out("events")._1 === expPurged)
    assert(out("events")._1 + out("events")._2 === ev.count())
    val o = spark.read.parquet(s"$dir/orders.parquet")
    assert(out("orders")._1 + out("orders")._2 === o.count())
    assert(out("events")._3 >= 0.0 && out("orders")._3 >= 0.0)
  }

  test("hoeffdingAudit: A/A never separates; radii positive; means inside range") {
    val rows = Relational.hoeffdingAudit(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("separated"),
        s"A/A arms separated for ${r.getString(0)}")
      assert(r.getAs[Double]("eps_a") > 0 && r.getAs[Double]("eps_b") > 0)
    }
  }

  test("skewAdvisor: hand-checked key profile and ceil-div salt suggestion") {
    val dir = java.nio.file.Files.createTempDirectory("skewadv").toString
    try {
      Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (3L, 6L))
        .toDF("l_partkey", "l_suppkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val out = Relational.skewAdvisor(spark, dir).collect()
        .map(r => r.getAs[String]("key_col") ->
          ((r.getAs[Long]("n_keys"), r.getAs[Long]("max_rows"),
            r.getAs[Double]("skew_ratio"), r.getAs[Long]("suggested_salt"))))
        .toMap
      assert(out("l_partkey") === ((3L, 4L, 2.0, 2L)))
      assert(out("l_suppkey") === ((6L, 1L, 1.0, 1L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("giniConcentration: equal lengths 0, hand-checked skew, two-point max") {
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    try {
      val rows = Seq(
        (1L, "a", "A", 1L), (2L, "a", "A", 1L),
        (3L, "a", "A", 1L), (4L, "a", "A", 1L),
        (5L, "a", "B", 1L), (6L, "a", "B", 3L),
        (7L, "a", "C", 0L), (8L, "a", "C", 10L))
        .map { case (id, t, src, n) => (id, t, "en", src, n) }
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = Relational.giniConcentration(spark, dir).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
            r.getAs[Double]("gini")))).toMap
      assert(out("A") === ((4L, 4L, 0.0)))
      assert(out("B") === ((2L, 4L, 0.25)))
      assert(out("C") === ((2L, 10L, 0.5)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("benfordAudit: digits from exact cents; shares and chi2 hand-checked") {
    val dir = java.nio.file.Files.createTempDirectory("benford").toString
    try {
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      // cents: 100, 2345, 299, 91100 -> digits 1, 2, 2, 9
      Seq(1.00, 23.45, 2.99, 911.00).zipWithIndex
        .map { case (p, i) => (i.toLong, 1L, "O", p, ts, "x") }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = Relational.benfordAudit(spark, dir).collect()
        .map(r => r.getAs[Int]("digit") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("observed_p"),
            r.getAs[Double]("expected_p"), r.getAs[Double]("chi2")))).toMap
      assert(out.keySet === Set(1, 2, 9))
      assert(out(1)._1 === 1L && out(2)._1 === 2L && out(9)._1 === 1L)
      assert(out(2)._2 === 0.5)
      assert(math.abs(out(1)._3 - math.log10(2.0)) < 1e-15)
      val e9 = 4 * math.log10(10.0 / 9)
      assert(math.abs(out(9)._4 - (1 - e9) * (1 - e9) / e9) < 1e-12)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("mannWhitney: matches a brute-force midrank computation per type") {
    val dir = "/root/testdata/sf0.001"
    val out = Relational.mannWhitney(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("u_a"), r.getAs[Double]("z")))).toMap
    // independent reference: same arm assignment, driver-side midranks
    val h = Relational.scrambleMod(graft.functions.TextHash.polyHash(
      concat(lit("ab:"), col("user_id").cast("string"))))
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value"), (h % 2).cast("int").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (typ, rs) =>
      val sorted = rs.map(x => (x._2, x._3)).sortBy(_._1)
      val midrank = sorted.zipWithIndex.groupBy(_._1._1).map {
        case (v, blk) => v -> (blk.map(_._2 + 1).sum.toDouble / blk.size)
      }
      val na = rs.count(_._3 == 0).toDouble
      val nb = rs.count(_._3 == 1).toDouble
      val ra = rs.filter(_._3 == 0).map(x => midrank(x._2)).sum
      val u = ra - na * (na + 1) / 2
      val n = na + nb
      val t = sorted.groupBy(_._1).values
        .map(b => math.pow(b.size, 3) - b.size).sum
      val sig2 = na * nb / 12 * ((n + 1) - t / (n * (n - 1)))
      val z = (u - na * nb / 2) / math.sqrt(sig2)
      val (ona, onb, ou, oz) = out(typ)
      assert(ona === na.toLong && onb === nb.toLong, typ)
      assert(math.abs(ou - u) < 1e-9, s"$typ: u $ou vs $u")
      assert(math.abs(oz - z) < 1e-9, s"$typ: z $oz vs $z")
    }
  }

  test("scd2Dimension: runs collapse, versions ascend, intervals chain") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val us = (m: Int) => m * 60L * 1000000L +
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    // user 1: A A B A  -> 3 runs; user 2: C -> 1 current run
    val rows = Seq(
      (1L, ts(0), 1L, "A", 0.0, "{}"), (2L, ts(1), 1L, "A", 0.0, "{}"),
      (3L, ts(2), 1L, "B", 0.0, "{}"), (4L, ts(3), 1L, "A", 0.0, "{}"),
      (5L, ts(0), 2L, "C", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.scd2Dimension(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
            r.getLong(5), r.getBoolean(6)))).toMap
      assert(out === Map(
        (1L, 1L) -> (("A", us(0), Some(us(2)), 2L, false)),
        (1L, 2L) -> (("B", us(2), Some(us(3)), 1L, false)),
        (1L, 3L) -> (("A", us(3), None, 1L, true)),
        (2L, 1L) -> (("C", us(0), None, 1L, true))))
    }
  }

  test("ksTest: hand-checked D on a 2x3 split; argmax tie takes smallest value") {
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    try {
      val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      // A = {10, 30}; B = {10, 20, 40}
      Seq((1L, 1L, "O", 10.0, d, "1-URGENT"), (2L, 1L, "O", 30.0, d, "2-HIGH"),
          (3L, 2L, "O", 10.0, d, "5-LOW"), (4L, 2L, "O", 20.0, d, "5-LOW"),
          (5L, 2L, "O", 40.0, d, "5-LOW"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val r = Relational.ksTest(spark, dir).collect()
      assert(r.length === 1)
      val row = r.head
      // ECDFs: v=10: |1*3-1*2|=1; v=20: |3-4|=1; v=30: |6-4|=2; v=40: 0
      assert(row.getAs[Long]("n_a") === 2L)
      assert(row.getAs[Long]("n_b") === 3L)
      assert(row.getAs[Long]("d_num") === 2L)
      assert(row.getAs[Double]("at_value") === 30.0)
      assert(math.abs(row.getAs[Double]("d") - 2.0 / 6.0) < 1e-15)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("scd2Dimension properties on real data: versions contiguous, runs partition each user's events") {
    val dir = "/root/testdata/sf0.001"
    val out = Relational.scd2Dimension(spark, dir).collect()
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val perUser = out.groupBy(_.getLong(0))
    perUser.foreach { case (u, rows) =>
      val vs = rows.map(_.getLong(1)).sorted
      assert(vs === (1L to vs.length).toArray.toSeq, s"user $u versions $vs")
      // intervals chain: each valid_to equals the next run's valid_from
      val byV = rows.sortBy(_.getLong(1))
      byV.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(0).getAs[Long]("valid_to_us") ===
          pair(1).getAs[Long]("valid_from_us"))
      }
      assert(byV.last.isNullAt(byV.last.fieldIndex("valid_to_us")))
      assert(byV.last.getAs[Boolean]("is_current"))
    }
    // run event counts partition the log exactly
    assert(out.map(_.getAs[Long]("n_events")).sum === ev.count())
  }

  test("ksTest matches a brute-force ECDF scan on real data") {
    val dir = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_totalprice"), col("o_orderpriority")).collect()
      .map(r => (r.getDouble(0),
        Set("1-URGENT", "2-HIGH").contains(r.getString(1))))
    val a = o.filter(_._2).map(_._1).sorted
    val b = o.filterNot(_._2).map(_._1).sorted
    val dNum = o.map(_._1).distinct.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length)
    }.max
    val row = Relational.ksTest(spark, dir).collect().head
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    assert(row.getAs[Long]("d_num") === dNum)
    assert(row.getAs[Double]("d") ===
      dNum.toDouble / (a.length.toLong * b.length).toDouble)
  }

  test("freshnessSlo: staleness vs global max, exact p95 gap, singleton-type nulls") {
    val ts = (sec: Int) => new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val rows = Seq(
      (1L, ts(0), 1L, "X", 0.0, "{}"), (2L, ts(10), 1L, "X", 0.0, "{}"),
      (3L, ts(20), 1L, "X", 0.0, "{}"), (4L, ts(100), 1L, "X", 0.0, "{}"),
      (5L, ts(200), 1L, "Y", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.freshnessSlo(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("staleness_us"),
            r.getAs[Long]("span_us"),
            Option(r.get(r.fieldIndex("max_gap_s"))).map(_.asInstanceOf[Long]),
            Option(r.get(r.fieldIndex("p95_gap_s"))).map(_.asInstanceOf[Long]),
            Option(r.get(r.fieldIndex("rate_per_hour")))
              .map(_.asInstanceOf[Double])))).toMap
      // X: gaps {10,10,80}s, k95 = ceil(.95*3) = 3 -> p95 = 80
      assert(out("X") === ((4L, 100000000L, 100000000L, Some(80L), Some(80L),
        Some(4.0 / (100000000.0 / 3600000000.0)))))
      // Y: one event — no gaps, zero span, rate null
      assert(out("Y") === ((1L, 0L, 0L, None, None, None)))
    }
  }

  test("absorptionProb: hand-unrolled 3-state chain with quantized products") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // one user's walk A,B,P,B,A,B,P: p(A,B)=1, p(B,P)=2/3, p(B,A)=1/3, p(P,B)=1
    val seqTypes = Seq("A", "B", "purchase", "B", "A", "B", "purchase")
    val rows = seqTypes.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, ts(i), 1L, t, 0.0, "{}")
    }
    def q14(x: Double) = new java.math.BigDecimal(x)
      .setScale(14, java.math.RoundingMode.HALF_UP).doubleValue()
    withEventsDir(rows) { dir =>
      val out = Relational.absorptionProb(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Double]("p_step1"), r.getAs[Double]("p_step2"),
            r.getAs[Double]("p_step3"), r.getAs[Double]("p_step4")))).toMap
      val pBP = 2.0 / 3.0
      val a1 = Map("A" -> 0.0, "B" -> pBP, "purchase" -> 0.0)
      def step(prev: Map[String, Double]) = Map(
        "A" -> (0.0 + q14(1.0 * prev("B"))),
        "B" -> (pBP + q14((1.0 / 3.0) * prev("A"))),
        "purchase" -> (0.0 + q14(1.0 * prev("B"))))
      val (a2, a3, a4) = (step(a1), step(step(a1)), step(step(step(a1))))
      Seq("A", "B", "purchase").foreach { t =>
        assert(out(t) === ((a1(t), a2(t), a3(t), a4(t))), s"type $t")
      }
      // sanity: probabilities ascend with the horizon
      out.values.foreach { case (p1, p2, p3, p4) =>
        assert(p1 <= p2 + 1e-15 && p2 <= p3 + 1e-15 && p3 <= p4 + 1e-15)
      }
    }
  }

  test("snapshotDiff: added/changed/rewritten/untouched classes partition the key space") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (1L, ts(0), 1L, "a", 1.0, "{}"), (2L, ts(10), 1L, "a", 2.0, "{}"), // changed
      (3L, ts(0), 2L, "a", 5.0, "{}"), (4L, ts(10), 2L, "a", 5.0, "{}"), // rewritten
      (5L, ts(0), 3L, "a", 7.0, "{}"),                                   // untouched
      (6L, ts(10), 4L, "a", 9.0, "{}"))                                  // added
    withEventsDir(rows) { dir =>
      val r = Relational.snapshotDiff(spark, dir).collect()
      assert(r.length === 1)
      val row = r.head
      assert(row.getAs[Long]("n_keys_final") === 4L)
      assert(row.getAs[Long]("n_keys_mid") === 3L)
      assert(row.getAs[Long]("n_added") === 1L)
      assert(row.getAs[Long]("n_changed") === 1L)
      assert(row.getAs[Long]("n_rewritten") === 1L)
      assert(row.getAs[Long]("n_untouched") === 1L)
    }
  }

  test("medianCi equals brute-force order statistics on real data") {
    val dir = "/root/testdata/sf0.001"
    val out = Relational.medianCi(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("median"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))).toMap
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (typ, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val n = sorted.length
      val kLo = math.max(1L,
        math.floor((n - 1.96 * math.sqrt(n.toDouble)) / 2.0).toLong + 1)
      val kMed = (n + 1) / 2
      val kHi = math.min(n.toLong,
        math.ceil((n + 1.96 * math.sqrt(n.toDouble)) / 2.0).toLong)
      val (on, om, olo, ohi) = out(typ)
      assert(on === n.toLong)
      assert(om === sorted(kMed.toInt - 1), s"$typ median")
      assert(olo === sorted(kLo.toInt - 1), s"$typ ci_lo")
      assert(ohi === sorted(kHi.toInt - 1), s"$typ ci_hi")
      assert(olo <= om && om <= ohi)
    }
  }

  test("rfmSegments: aligned best-first ranks give consistent 1-4 scores on 8 customers") {
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    try {
      val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
      // customer k: k orders, all on day k, 100 each -> frequency k,
      // monetary 100k, recency 8-k: rank 9-k in every dimension
      var oid = 0L
      val rows = (1 to 8).flatMap { k =>
        (1 to k).map { _ =>
          oid += 1; (oid, k.toLong, "O", 100.0, ts(k), "p")
        }
      }
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = Relational.rfmSegments(spark, dir).collect()
        .map(r => r.getAs[Long]("custkey") ->
          ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
            r.getAs[Double]("monetary"), r.getAs[Long]("r_score"),
            r.getAs[Long]("f_score"), r.getAs[Long]("m_score"),
            r.getAs[Long]("segment")))).toMap
      val expScore = Map(8 -> 4L, 7 -> 4L, 6 -> 3L, 5 -> 3L,
        4 -> 2L, 3 -> 2L, 2 -> 1L, 1 -> 1L)
      (1 to 8).foreach { k =>
        val (rd, f, m, r, fq, mq, seg) = out(k.toLong)
        assert(rd === (8 - k).toLong && f === k.toLong && m === 100.0 * k)
        val e = expScore(k)
        assert(r === e && fq === e && mq === e, s"cust $k scores $r $fq $mq")
        assert(seg === e * 111L)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("burstiness: metronome gaps score exactly -1; balanced two-gap mix scores 0") {
    val ts = (sec: Int) => new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val rows = Seq(
      (1L, ts(0), 1L, "P", 0.0, "{}"), (2L, ts(10), 1L, "P", 0.0, "{}"),
      (3L, ts(20), 1L, "P", 0.0, "{}"), (4L, ts(30), 1L, "P", 0.0, "{}"),
      (5L, ts(0), 1L, "Q", 0.0, "{}"), (6L, ts(2), 1L, "Q", 0.0, "{}"),
      (7L, ts(2), 1L, "Q", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.burstiness(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n_gaps"), r.getAs[Double]("mean_gap_s"),
            r.getAs[Double]("std_gap_s"), r.getAs[Double]("burstiness")))).toMap
      assert(out("P") === ((3L, 10.0, 0.0, -1.0)))
      // Q gaps {2, 0}: mu = 1, sigma = 1 -> B = 0
      assert(out("Q") === ((2L, 1.0, 1.0, 0.0)))
    }
  }

  test("seasonalityStrength: pure weekly pattern gives eta2=1; constant series gives null") {
    // 2024-01-01 is a Monday. X over 14 days: 3 events on Mondays, 1
    // otherwise -> within-dow variance exactly 0 -> eta2 = 1. Y over 7
    // days: 2 events daily -> total variance 0 -> eta2 null, peak tie
    // broken to dow 1.
    val day = (d: Int, h: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 0$h:00:00")
    var id = 0L
    def mk(d: Int, n: Int, typ: String) = (0 until n).map { h =>
      id += 1; (id, day(d, h), 1L, typ, 0.0, "{}")
    }
    val rows = (0 until 14).flatMap(d =>
      mk(d, if (d % 7 == 0) 3 else 1, "X")) ++
      (0 until 7).flatMap(d => mk(d, 2, "Y"))
    withEventsDir(rows) { dir =>
      val out = Relational.seasonalityStrength(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n_days"), r.getAs[Double]("ss_total"),
            r.getAs[Double]("ss_within"),
            Option(r.get(r.fieldIndex("eta2"))).map(_.asInstanceOf[Double]),
            r.getAs[Long]("peak_dow"), r.getAs[Double]("peak_mean")))).toMap
      val (xn, xt, xw, xe, xp, xm) = out("X")
      assert(xn === 14L && xw === 0.0 && xe === Some(1.0))
      // SST = q - s^2/D = (2*9 + 12*1) - 18^2/14
      assert(math.abs(xt - (30.0 - 18.0 * 18.0 / 14.0)) < 1e-12)
      assert(xp === 1L && xm === 3.0)
      val (yn, yt, yw, ye, yp, ym) = out("Y")
      assert(yn === 7L && yt === 0.0 && yw === 0.0 && ye === None)
      assert(yp === 1L && ym === 2.0)
    }
  }

  test("churnHazard: gap rule, censoring, at-risk suffix and decimal cumulative") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: churns after hour-1 event (71h gap) -> lifetime day 0
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "a", 0.0, "{}"),
      (3L, ts("2024-01-04 00:00:00"), 1L, "a", 0.0, "{}"),
      // user 2: steady 24h cadence -> censored at last day 2
      (4L, ts("2024-01-01 00:00:00"), 2L, "a", 0.0, "{}"),
      (5L, ts("2024-01-02 00:00:00"), 2L, "a", 0.0, "{}"),
      (6L, ts("2024-01-03 00:00:00"), 2L, "a", 0.0, "{}"),
      // user 3: 49h gap from its first event -> churn at day 0
      (7L, ts("2024-01-01 00:00:00"), 3L, "a", 0.0, "{}"),
      (8L, ts("2024-01-03 01:00:00"), 3L, "a", 0.0, "{}"))
    withEventsDir(rows) { dir =>
      val out = Relational.churnHazard(spark, dir).collect()
        .map(r => r.getAs[Long]("lifetime_days") ->
          ((r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_churned"),
            r.getAs[Long]("n_censored"), r.getAs[Double]("hazard"),
            r.getAs[Double]("cum_hazard")))).toMap
      assert(out.keySet === Set(0L, 2L))
      val q23 = new java.math.BigDecimal(2.0 / 3.0)
        .setScale(14, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(out(0L) === ((3L, 2L, 0L, 2.0 / 3.0, q23)))
      assert(out(2L) === ((1L, 0L, 1L, 0.0, q23)))
    }
  }

  test("forecastSkill: zero-filled gap days enter both MAEs; ratio is exact") {
    val day = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 05:00:00")
    // type X daily counts over 9 days: 3,0,1,1,1,1,1,3,1 — day 2 has no
    // events, so the calendar fill must supply its 0 (it feeds idx 8's
    // seasonal lag)
    val cnts = Seq(3, 0, 1, 1, 1, 1, 1, 3, 1)
    val rows = cnts.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map(j => ((i * 10 + j).toLong, day(i), 1L, "X", 0.0, "{}"))
    }
    withEventsDir(rows) { dir =>
      val r = Relational.forecastSkill(spark, dir).collect()
      assert(r.length === 1)
      val row = r.head
      // eval days: idx 7,8. naive: |3-1|+|1-3| = 4
      // seasonal: |3-3|+|1-0| = 1  -> mase 0.25
      assert(row.getAs[Long]("n_days_eval") === 2L)
      assert(row.getAs[Long]("naive_err") === 4L)
      assert(row.getAs[Long]("seasonal_err") === 1L)
      assert(row.getAs[Double]("mase") === 0.25)
    }
  }
}
