package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.plans.AsofJoinPlan

/** Pins the native as-of join operator (`graft.plans.AsofJoinNode` →
  * `AsofJoinExec` via the injected `AsofJoinStrategy`):
  *
  *  - semantics: row-identical to the union+window `AsofJoin.backward`
  *    (itself DuckDB-ASOF-JOIN-green via q23) on dense random data
  *    including tie timestamps, keyless-match rows, and multi-key
  *    grouping;
  *  - plan: the physical plan actually contains the custom exec node
  *    (the strategy is load-bearing, not decorative) and both children
  *    arrive hash-clustered on the join keys;
  *  - scale shape: no window over the union, no cartesian, exchanges
  *    keyed on the as-of keys only.
  */
class AsofExecSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic dense fixture: 40 users × interleaved clicks/views
  // with heavy CROSS-side tie density (left tsn == right tsn pins the
  // inclusive <=/>= boundary). The right side is deduped to one row
  // per (user_id, click_tsn) — same contract as the registered
  // queries' arg-max pre-aggregation — because NO form (native exec,
  // union+window, DuckDB ASOF) specifies a tie-break among equal-
  // (key, time) right rows, and asserting exact equality on an
  // unspecified order is a flake (round-4 advice).
  private lazy val fixture: (DataFrame, DataFrame) = {
    val rng = new scala.util.Random(7)
    val rows = (1 to 1200).map { i =>
      val u = rng.nextInt(40)
      val t = rng.nextInt(300).toLong // heavy tie density
      val typ = if (rng.nextBoolean()) "click" else "view"
      (i.toLong, s"u$u", t, typ, rng.nextInt(1000) / 10.0)
    }
    val df = rows.toDF("event_id", "user_id", "tsn", "event_type", "value")
    val p = java.nio.file.Files.createTempDirectory("graft-asof").toString
    df.write.mode("overwrite").parquet(p)
    val ev = spark.read.parquet(p)
    val l = ev.filter($"event_type" === "view")
      .select("event_id", "user_id", "tsn")
    val r = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"tsn".as("click_tsn"))
      .agg(max(struct($"event_id", $"value")).getField("value")
        .as("click_value"))
    (l, r)
  }

  private def canon(df: DataFrame): Seq[(Long, String, Long, Option[Double], Option[Long])] =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toIndexedSeq.sortBy(t => (t._1, t._2, t._3))

  test("native exec matches union+window backward as-of exactly") {
    val (l, r) = fixture
    val viaWindow = AsofJoin.backward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "prev_")
    val viaExec = AsofJoinPlan.backward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "prev_")
    assert(viaExec.columns.toSeq === viaWindow.columns.toSeq)
    assert(canon(viaExec) === canon(viaWindow))
    // some rows must actually match and some must be null, or the
    // fixture isn't exercising anything
    val matched = viaExec.filter($"prev_click_tsn".isNotNull).count()
    assert(matched > 0 && matched < viaExec.count())
  }

  test("physical plan contains AsofJoinExec fed by key-clustered exchanges") {
    val (l, r) = fixture
    val df = AsofJoinPlan.backward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "prev_")
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("AsofJoin"), s"no AsofJoinExec in:\n$plan")
    assert(!plan.contains("!AsofJoin"),
      s"exec node marked invalid (missing producedAttributes?):\n$plan")
    assert(!plan.contains("WindowExec"), s"window leaked into exec plan:\n$plan")
    val exchanges =
      "hashpartitioning\\(user_id".r.findAllIn(plan.toLowerCase).size
    assert(exchanges >= 2, s"expected both sides clustered on user_id:\n$plan")
  }

  test("empty right side yields all-null payload, same rows as left") {
    val (l, r) = fixture
    val empty = r.filter(lit(false))
    val df = AsofJoinPlan.backward(l, empty, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "prev_")
    assert(df.count() === l.count())
    assert(df.filter($"prev_click_tsn".isNotNull).count() === 0)
  }

  test("native forward cursor matches union+window forward as-of exactly") {
    val (l, r) = fixture
    val viaWindow = AsofJoin.forward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "next_")
    val viaExec = AsofJoinPlan.forward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "next_")
    assert(viaExec.columns.toSeq === viaWindow.columns.toSeq)
    assert(canon(viaExec) === canon(viaWindow))
    val matched = viaExec.filter($"next_click_tsn".isNotNull).count()
    assert(matched > 0 && matched < viaExec.count())
    // inclusive >=: at least one exact-tie match must land
    assert(viaExec.filter($"next_click_tsn" === $"tsn").count() > 0)
  }

  test("property: native exec equals an independent brute-force model (both directions, with/without tolerance)") {
    // the other equivalence tests compare against the union+window
    // twin; this one checks a THIRD, structurally unrelated model —
    // per left row, scan all right rows and pick the
    // nearest-at-or-before/after — so a shared misconception between
    // the two production forms cannot hide
    for (seed <- Seq(3, 41)) {
      val rng = new scala.util.Random(seed)
      val lRows = (1 to 300).map(i =>
        (i.toLong, s"k${rng.nextInt(12)}", rng.nextInt(100).toLong))
      val rRows = (1 to 200).map { i =>
        (s"k${rng.nextInt(12)}", rng.nextInt(100).toLong)
      }.distinct.map { case (k, t) => (k, t, rng.nextDouble()) }
      val l = lRows.toDF("event_id", "user_id", "tsn")
      val r = rRows.toDF("user_id", "click_tsn", "click_value")
      for (fwd <- Seq(false, true); tol <- Seq(None, Some(7L))) {
        val got = (if (fwd)
            AsofJoinPlan.forward(l, r, Seq("user_id"), "tsn", "click_tsn",
              Seq("click_value"), "m_", toleranceUs = tol)
          else
            AsofJoinPlan.backward(l, r, Seq("user_id"), "tsn", "click_tsn",
              Seq("click_value"), "m_", toleranceUs = tol))
          .collect().map(x => x.getLong(0) ->
            (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
        val want = lRows.map { case (id, k, t) =>
          val cand = rRows.filter(_._1 == k)
            .filter(c => if (fwd) c._2 >= t else c._2 <= t)
          val best =
            if (cand.isEmpty) None
            else Some(if (fwd) cand.minBy(_._2) else cand.maxBy(_._2))
          id -> best.filter(c => tol.forall(d => math.abs(c._2 - t) <= d))
            .map(_._3)
        }.toMap
        assert(got === want, s"seed=$seed fwd=$fwd tol=$tol")
      }
    }
  }

  test("null times: forward never matches them; backward treats a null right as before everything") {
    // left: one real-time row and one null-time row per user
    val l = Seq((1L, "u1", Some(5L)), (2L, "u1", None))
      .toDF("event_id", "user_id", "tsn")
    // right: a null-time row, an early row, and a late row
    val r = Seq(("u1", Some(1L), 1.0), ("u1", Some(10L), 10.0),
        ("u1", None, 99.0))
      .toDF("user_id", "click_tsn", "click_value")
    val fwd = AsofJoinPlan.forward(l, r, Seq("user_id"), "tsn",
        "click_tsn", Seq("click_value"), "next_")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    // t=5 → first at-or-after is t=10; null left time → NO match (a
    // null sorts first, so without the guard it would grab the key's
    // EARLIEST row — DuckDB ASOF `>= NULL` matches nothing)
    assert(fwd === Map(1L -> Some(10.0), 2L -> None))
    val bwd = AsofJoinPlan.backward(l, r, Seq("user_id"), "tsn",
        "click_tsn", Seq("click_value"), "prev_")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    // t=5 → last at-or-before is t=1; null left time → only the
    // null-time right row is "at-or-before" it (nulls sort first —
    // the documented natural-ordering contract)
    assert(bwd === Map(1L -> Some(1.0), 2L -> Some(99.0)))
  }

  test("native tolerance nulls exactly the matches staler than the bound") {
    val (l, r) = fixture
    val tol = 20L
    val viaExec = AsofJoinPlan.backward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "prev_", Some(tol))
    val base = AsofJoin.backward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "prev_")
    val ok = $"prev_click_tsn".isNotNull && $"tsn" - $"prev_click_tsn" <= tol
    val oracle = base.select($"event_id", $"user_id", $"tsn",
      when(ok, $"prev_click_value").as("prev_click_value"),
      when(ok, $"prev_click_tsn").as("prev_click_tsn"))
    assert(canon(viaExec) === canon(oracle))
    // the bound must be live: strictly fewer matches than unbounded
    val bounded = viaExec.filter($"prev_click_tsn".isNotNull).count()
    val unbounded = base.filter($"prev_click_tsn".isNotNull).count()
    assert(bounded > 0 && bounded < unbounded)
  }

  test("forward tolerance bounds the look-ahead") {
    val (l, r) = fixture
    val tol = 15L
    val viaExec = AsofJoinPlan.forward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "next_", Some(tol))
    val base = AsofJoin.forward(l, r, Seq("user_id"), "tsn",
      "click_tsn", Seq("click_value", "click_tsn"), "next_")
    val ok = $"next_click_tsn".isNotNull && $"next_click_tsn" - $"tsn" <= tol
    val oracle = base.select($"event_id", $"user_id", $"tsn",
      when(ok, $"next_click_value").as("next_click_value"),
      when(ok, $"next_click_tsn").as("next_click_tsn"))
    assert(canon(viaExec) === canon(oracle))
  }

  test("multi-key as-of agrees with union+window form") {
    val (l0, r0) = fixture
    // second key: parity bucket — exercises composite clustering
    val l = l0.withColumn("b", ($"event_id" % 2).cast("int"))
    val r = r0.withColumn("b", (($"click_tsn" + 1) % 2).cast("int"))
    val viaWindow = AsofJoin.backward(l, r, Seq("user_id", "b"), "tsn",
      "click_tsn", Seq("click_value"), "m_")
    val viaExec = AsofJoinPlan.backward(l, r, Seq("user_id", "b"), "tsn",
      "click_tsn", Seq("click_value"), "m_")
    val a = viaWindow.orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = viaExec.orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
