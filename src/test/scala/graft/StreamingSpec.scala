package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.abs
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Smoothing
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("incremental smooth equals batch interior values, across micro-batch boundaries") {
    val rng = new java.util.Random(3)
    val rows = (0 until 200).map(i =>
      SignalRow("e", 0, i.toLong, i / 100.0, rng.nextDouble() * 10))
    val batch = Smoothing.withSmooth(rows.toDS().toDF())
      .filter($"sample_idx" >= 25 && $"sample_idx" < 175)
      .select("sample_idx", "y_smooth").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val stream = MemoryStream[SignalRow]
    val q = StreamingOps.incrementalSmooth(stream.toDS())
      .writeStream.format("memory").queryName("smooth_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // three uneven chunks force state carry-over mid-window
      stream.addData(rows.take(40)); q.processAllAvailable()
      stream.addData(rows.slice(40, 41)); q.processAllAvailable()
      stream.addData(rows.drop(41)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("smooth_test").collect()
      .map(r => r.getAs[Long]("sample_idx") -> r.getAs[Double]("y_smooth")).toMap
    assert(got.keySet === batch.keySet)
    got.foreach { case (i, v) => assert(v === batch(i), s"at $i") }
  }

  test("incremental smooth keeps channels independent") {
    val rows = (0 until 120).flatMap(i => Seq(
      SignalRow("e", 0, i.toLong, i / 100.0, i.toDouble),
      SignalRow("e", 1, i.toLong, i / 100.0, -i.toDouble)))
    val stream = MemoryStream[SignalRow]
    val q = StreamingOps.incrementalSmooth(stream.toDS())
      .writeStream.format("memory").queryName("smooth_chan")
      .outputMode(OutputMode.Append()).start()
    try { stream.addData(rows); q.processAllAvailable() } finally q.stop()
    val out = spark.table("smooth_chan")
    // linear signals are reproduced exactly by SG (polyorder 7 >= 1)
    val bad = out.filter(
      ($"channel" === 0 && abs($"y_smooth" - $"sample_idx") > 1e-9) ||
      ($"channel" === 1 && abs($"y_smooth" + $"sample_idx") > 1e-9)).count()
    assert(bad === 0L)
    assert(out.filter($"channel" === 0).count() === 70L) // 120 - 50 edge
  }

  test("incremental candidates equal batch rule-1 maxima on the interior") {
    val rng = new java.util.Random(9)
    val rows = (0 until 400).map(i =>
      SignalRow("e", 0, i.toLong, i / 100.0,
        math.sin(i / 7.0) * 5 + rng.nextDouble()))
    val batch = graft.operators.PeakDetect.candidates(
        graft.operators.Smoothing.withSmooth(rows.toDS().toDF()))
      .filter($"sample_idx" >= 26 && $"sample_idx" <= 400 - 27)
      .select("sample_idx").collect().map(_.getLong(0)).toSet

    val stream = MemoryStream[SignalRow]
    val q = StreamingOps.incrementalCandidates(stream.toDS())
      .writeStream.format("memory").queryName("cand_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows.take(100)); q.processAllAvailable()
      stream.addData(rows.drop(100)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cand_stream").collect()
      .map(_.getAs[Long]("sample_idx"))
      .filter(i => i >= 26 && i <= 400 - 27).toSet
    assert(got === batch)
  }

  test("dedupStream drops cross-micro-batch duplicates via keyed state") {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingOps.dedupStream(
        stream.toDS().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, t0, "a"), (2L, t0, "b"), (1L, t0, "a-dup"))
      q.processAllAvailable()
      stream.addData((1L, t0, "a-again"), (3L, t0, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L)) // dup in AND across batches dropped
  }

  test("eventsHourly: streaming result equals the batch computation") {
    val evs = (0 until 300).map { i =>
      (Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        if (i % 3 == 0) "click" else "view", i * 1.5)
    }
    val batch = StreamingOps.eventsHourly(
        evs.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    val stream = MemoryStream[(Timestamp, String, Double)]
    val q = StreamingOps.eventsHourly(
        stream.toDS().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ev_hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      stream.addData(evs.take(150)); q.processAllAvailable()
      stream.addData(evs.drop(150)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ev_hourly").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === batch)
  }
}
