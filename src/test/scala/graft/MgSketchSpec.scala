package graft

import graft.functions.{HashReservoir, MgSketch}
import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Sketch-guarantee pins for the heavy-hitter and reservoir UDAFs. */
class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  private def withCorpusDir(rows: Seq[(Long, String, String, String)])
                           (f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("mg").toString
    try {
      rows.map { case (id, text, lang, source) =>
        (id, text, lang, source, text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("MgSketch below saturation: exact counts under any merge tree") {
    val mg = new MgSketch(16)
    val tokens = Seq.fill(3)(Seq("a", "b", "a", "c", "a", "b")).flatten
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // three different merge shapes over the same multiset
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val shuffled = rng.shuffle(tokens)
      val parts = shuffled.grouped(1 + rng.nextInt(5)).toSeq
      val bufs = parts.map(_.foldLeft(mg.zero)((b, t) => mg.reduce(b, ("g", t))))
      val merged = rng.shuffle(bufs).reduce(mg.merge _)
      assert(merged === exact)
    }
  }

  test("MgSketch saturated: epsilon guarantee holds under random merge trees") {
    val k = 8
    val mg = new MgSketch(k)
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // zipf-ish: token i appears ~60/(i+1) times over 30 distinct
      val tokens = rng.shuffle(
        (0 until 30).flatMap(i => Seq.fill(60 / (i + 1))(s"t$i")))
      val n = tokens.size.toLong
      val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = tokens.grouped(1 + rng.nextInt(20)).toSeq
      val bufs = parts.map(_.foldLeft(mg.zero)((b, t) => mg.reduce(b, ("g", t))))
      val merged = rng.shuffle(bufs).reduce(mg.merge _)
      val eps = n / (k + 1L)
      assert(merged.size <= k)
      merged.foreach { case (t, c) =>
        assert(c <= exact(t), s"trial $trial: overcount of $t")
        assert(c >= exact(t) - eps, s"trial $trial: undercount of $t beyond n/(k+1)")
      }
      // every token with true count > n/(k+1) must survive
      exact.filter(_._2 > eps).keys.foreach { t =>
        assert(merged.contains(t), s"trial $trial: heavy hitter $t dropped")
      }
    }
  }

  test("heavyHitters and groupSample are invariant to input partitioning") {
    val docs = (0L until 60L).map(i =>
      (i, s"alpha beta tok$i alpha", "en", if (i % 2 == 0) "web" else "books"))
    withCorpusDir(docs) { dir =>
      val hh1 = Pipeline.heavyHitters(spark, dir).collect().map(_.toString).sorted
      val gs1 = Pipeline.groupSample(spark, dir).collect().map(_.toString).sorted
      // re-read with a different partitioning via a repartitioned copy
      val dir2 = java.nio.file.Files.createTempDirectory("mg2").toString
      try {
        spark.read.parquet(s"$dir/documents.parquet").repartition(7)
          .write.parquet(s"$dir2/documents.parquet")
        val hh2 = Pipeline.heavyHitters(spark, dir2).collect().map(_.toString).sorted
        val gs2 = Pipeline.groupSample(spark, dir2).collect().map(_.toString).sorted
        assert(hh1.toSeq === hh2.toSeq)
        assert(gs1.toSeq === gs2.toSeq)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir2))
      }
      // alpha dominates every source
      val top = Pipeline.heavyHitters(spark, dir).filter($"rnk" === 1).collect()
      assert(top.forall(_.getAs[String]("token") == "alpha"))
    }
  }

  test("HashReservoir keeps the k smallest (hash, id) pairs, mergeable, no dups") {
    val r = new HashReservoir(4)
    val items = Seq((9L, 1L), (3L, 2L), (7L, 3L), (1L, 4L), (5L, 5L), (2L, 6L))
      .map { case (h, id) => ("g", h, id) }
    val whole = items.foldLeft(r.zero)((b, e) => r.reduce(b, e))
    assert(whole.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L))
    // split + merge, with one duplicate element across partitions
    val (p1, p2) = items.splitAt(3)
    val b1 = (p1 :+ (("g", 1L, 4L))).foldLeft(r.zero)((b, e) => r.reduce(b, e))
    val b2 = p2.foldLeft(r.zero)((b, e) => r.reduce(b, e))
    assert(r.merge(b1, b2).toSeq === whole.toSeq)
  }

  test("HashValueReservoir keeps values of the k smallest keys; hash ties survive via id") {
    val r = new graft.functions.HashValueReservoir(3)
    // two rows share hash 1 but have distinct ids — both must be kept
    val items = Seq((1L, 10L, 0.5), (1L, 11L, 0.7), (9L, 12L, 9.9),
      (4L, 13L, 0.1), (2L, 14L, 0.3))
      .map { case (h, id, v) => ("g", h, id, v) }
    val whole = items.foldLeft(r.zero)((b, e) => r.reduce(b, e))
    assert(r.finish(whole) === Seq(0.5, 0.7, 0.3))
    // merge path keeps the same triples under any split
    val (p1, p2) = items.splitAt(2)
    val b1 = p1.foldLeft(r.zero)((b, e) => r.reduce(b, e))
    val b2 = p2.foldLeft(r.zero)((b, e) => r.reduce(b, e))
    assert(r.finish(r.merge(b1, b2)) === r.finish(whole))
  }

  test("sketchQuantiles: sample_k caps at k and estimates bracket reality on uniform data") {
    val dir = java.nio.file.Files.createTempDirectory("sq").toString
    try {
      val rng = new java.util.Random(111)
      (0 until 5000).map { i =>
        (i.toLong, new java.sql.Timestamp(i * 1000L), (i % 40).toLong,
          s"t${i % 2}", rng.nextDouble() * 100, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = graft.operators.Sketches.sketchQuantiles(spark, dir, k = 128)
        .collect()
      assert(out.length === 2)
      out.foreach { row =>
        assert(row.getAs[Long]("sample_k") === 128L)
        assert(row.getAs[Long]("n_rows") === 2500L)
        // a 128-sample p50 of U[0,100] lands well inside [35, 65]
        val est = row.getAs[Double]("est_p50")
        val exact = row.getAs[Double]("exact_p50")
        assert(math.abs(est - exact) < 15.0, s"p50 est $est vs exact $exact")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
