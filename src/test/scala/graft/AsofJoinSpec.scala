package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward: latest right at-or-before each left row, per key") {
    val left = Seq(("u1", 10L, "a"), ("u1", 25L, "b"), ("u2", 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq(("u1", 5L, 1.0), ("u1", 20L, 2.0), ("u2", 30L, 9.0))
      .toDF("k", "rt", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "rt",
        Seq("v", "rt"), "prev_")
      .orderBy("k", "t").collect()
    // u1@10 -> right@5; u1@25 -> right@20; u2@10 -> none
    assert(out(0).getAs[Double]("prev_v") === 1.0)
    assert(out(1).getAs[Double]("prev_v") === 2.0)
    assert(out(2).isNullAt(out(2).fieldIndex("prev_v")))
  }

  test("backward is inclusive: right row at the exact left time matches") {
    val left = Seq(("k", 10L)).toDF("k", "t")
    val right = Seq(("k", 10L, 7.0)).toDF("k", "rt", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect()
    assert(out.head.getAs[Double]("asof_v") === 7.0)
  }

  test("forward: earliest right at-or-after each left row, per key") {
    val left = Seq(("u1", 10L), ("u1", 25L), ("u2", 40L)).toDF("k", "t")
    val right = Seq(("u1", 10L, 1.0), ("u1", 30L, 2.0), ("u2", 5L, 9.0))
      .toDF("k", "rt", "v")
    val out = AsofJoin.forward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    assert(out(0).getAs[Double]("asof_v") === 1.0) // inclusive at t=10
    assert(out(1).getAs[Double]("asof_v") === 2.0)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v"))) // nothing follows
  }

  test("left columns pass through untouched") {
    val left = Seq(("k", 10L, "payload")).toDF("k", "t", "extra")
    val right = Seq(("k", 1L, 5.0)).toDF("k", "rt", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.columns.toSeq === Seq("k", "t", "extra", "asof_v"))
    assert(out.head().getAs[String]("extra") === "payload")
  }

  test("prevClickWithin nulls matches staler than the tolerance") {
    val dir = java.nio.file.Files.createTempDirectory("asoftol").toString
    try {
      val ts = (s: String) => java.sql.Timestamp.valueOf(s)
      Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 5.0, "{}"),
        (2L, ts("2024-01-01 10:05:00"), 1L, "view", 0.0, "{}"),  // 5m: kept
        (3L, ts("2024-01-01 10:30:00"), 1L, "view", 0.0, "{}"))  // 30m: nulled
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = AsofJoin.prevClickWithin(spark, dir)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.get(r.fieldIndex("prev_click_value")))).toMap
      assert(out(2L) === Some(5.0))
      assert(out(3L) === None)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
