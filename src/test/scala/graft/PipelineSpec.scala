package graft

import graft.functions.{KmvSketch, TextHash}
import graft.operators.{Pipeline, Similarity}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def withCorpusDir(rows: Seq[(Long, String, String, String)])
                           (f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("pipeline").toString
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

  // ---- KmvSketch unit behavior ----

  test("KmvSketch: exact below saturation, capped and order-insensitive above") {
    val sk = new KmvSketch(4, 1000L)
    val values = Seq(700L, 50L, 300L, 50L, 900L, 10L, 500L, 300L)
    val fold = values.foldLeft(sk.zero)((b, v) => sk.reduce(b, ("g", v)))
    assert(fold.toSeq === Seq(10L, 50L, 300L, 500L)) // 4 smallest distinct
    // any partitioning into partial buffers merges to the same state
    val (l, r) = values.splitAt(3)
    val merged = sk.merge(
      l.foldLeft(sk.zero)((b, v) => sk.reduce(b, ("g", v))),
      r.reverse.foldLeft(sk.zero)((b, v) => sk.reduce(b, ("g", v))))
    assert(merged.toSeq === fold.toSeq)
    val out = sk.finish(fold)
    assert(out.n_kept === 4 && out.kth_min === 500L)
    assert(math.abs(out.est_distinct - 3.0 * 1000.0 / 500.0) < 1e-12)
    // below saturation: exact count, no extrapolation
    val small = sk.finish(sk.reduce(sk.reduce(sk.zero, ("g", 9L)), ("g", 2L)))
    assert(small.n_kept === 2 && small.kth_min === -1L && small.est_distinct === 2.0)
  }

  test("kmvDistinctTokens: sketch is exact for a group with < k distinct tokens") {
    withCorpusDir(Seq(
      (0L, "a b c a", "en", "web"),
      (1L, "b c d", "en", "web"),
      (2L, "x y", "en", "books"))) { dir =>
      val out = Pipeline.kmvDistinctTokens(spark, dir, k = 64).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Double]("est_distinct")).toMap
      assert(out === Map("web" -> 4.0, "books" -> 2.0))
    }
  }

  // ---- hashSplit ----

  test("hashSplit: partitions every doc exactly once with stable split labels") {
    val docs = (0L until 200L).map(i => (i, s"doc number $i text", "en",
      if (i % 2 == 0) "web" else "books"))
    withCorpusDir(docs) { dir =>
      val out = Pipeline.hashSplit(spark, dir).collect()
      assert(out.map(_.getAs[Long]("n_docs")).sum === 200L)
      val splits = out.map(_.getAs[String]("split")).toSet
      assert(splits.subsetOf(Set("train", "val", "test")))
      assert(splits.contains("train")) // 90% of buckets — must appear
      // determinism: a second run yields identical rows
      val again = Pipeline.hashSplit(spark, dir).collect()
      assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    }
  }

  test("stratifiedSplit: exact per-stratum proportions, equals the single-window form") {
    // two skewed strata: 100 "en" docs, 10 "fr" docs
    val docs = (0L until 100L).map(i => (i, s"en doc $i", "en", "web")) ++
      (100L until 110L).map(i => (i, s"fr doc $i", "fr", "web"))
    withCorpusDir(docs) { dir =>
      val out = Pipeline.stratifiedSplit(spark, dir).collect()
      assert(out.length === 110)
      val byLangSplit = out.groupBy(r =>
        (r.getAs[String]("lang"), r.getAs[String]("split")))
        .view.mapValues(_.length).toMap
      // exact floors: en 80/10/10, fr 8/1/1
      assert(byLangSplit === Map(("en", "train") -> 80, ("en", "val") -> 10,
        ("en", "test") -> 10, ("fr", "train") -> 8, ("fr", "val") -> 1,
        ("fr", "test") -> 1))
      // the bucketed two-level rank must equal the naive global window
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"))
        .withColumn("hh", TextHash.polyHash(col("doc_id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("hh"), col("doc_id"))
      val naive = d
        .withColumn("rnk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .select(col("doc_id"),
          when(col("rnk") * 100 <= col("n") * 80, "train")
            .when(col("rnk") * 100 <= col("n") * 90, "val")
            .otherwise("test").as("split"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      assert(out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
        === naive)
    }
  }

  test("curate: drops dup copies, contaminated docs, and the benchmark slice; labels survivors") {
    // ids 0..59: id 0 is the benchmark slice (id % 50 == 0 among these).
    // id 11 duplicates id 10 (exact-dedup drop); id 12 copies the
    // benchmark text (contaminated); everything else survives.
    def uniq(i: Long) = s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i hotel$i"
    val texts = (0L until 60L).map {
      case 11L => 11L -> uniq(10L)
      case 12L => 12L -> uniq(0L)
      case i => i -> uniq(i)
    }
    val docs = texts.map { case (i, t) => (i, t, "en", "web") }
    withCorpusDir(docs) { dir =>
      val out = Pipeline.curate(spark, dir, minQuality = 0.0).collect()
      val ids = out.map(_.getAs[Long]("doc_id")).toSet
      assert(!ids.contains(0L))  // benchmark slice excluded
      assert(!ids.contains(50L)) // benchmark slice excluded
      assert(ids.contains(10L) && !ids.contains(11L)) // keep-first dedup
      assert(!ids.contains(12L)) // contaminated
      assert(ids.size === 56)
      // every survivor carries a split label
      assert(out.forall(r =>
        Set("train", "val", "test")(r.getAs[String]("split"))))
    }
  }

  // ---- piiMask ----

  test("piiMask: masks emails then digit runs, counts both") {
    withCorpusDir(Seq(
      (0L, "mail me at jane.doe+x@example.org or call 555 1234", "en", "web"),
      (1L, "no pii here", "en", "web"))) { dir =>
      val rows = Pipeline.piiMask(spark, dir).orderBy("doc_id").collect()
      assert(rows(0).getAs[Long]("n_emails") === 1L)
      assert(rows(0).getAs[Long]("n_numbers") === 2L)
      assert(rows(0).getAs[String]("masked") ===
        "mail me at <EMAIL> or call <NUM> <NUM>")
      assert(rows(1).getAs[Long]("n_emails") === 0L)
      assert(rows(1).getAs[String]("masked") === "no pii here")
    }
  }

  // ---- domainMix ----

  test("domainMix: uniform-over-groups rate upweights the rare group and caps at 1") {
    // web/en: 8 docs, books/fr: 2 docs -> N=10, G=2, target N/G=5
    val docs = (0L until 8L).map(i => (i, s"t$i", "en", "web")) ++
      Seq((8L, "t8", "fr", "books"), (9L, "t9", "fr", "books"))
    withCorpusDir(docs) { dir =>
      val out = Pipeline.domainMix(spark, dir).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Double]("share"), r.getAs[Double]("sample_rate")))).toMap
      assert(out("web") === ((0.8, 5.0 / 8.0)))
      assert(out("books") === ((0.2, 1.0))) // 5/2 capped at 1
    }
  }

  // ---- labelCentroids ----

  test("packSequences: offsets are the exclusive prefix sum; chunk spans split at ctx boundaries") {
    // source "web": docs of 3, 4, 2 tokens; ctx=4 =>
    //   doc0: off 0, chunks [0,0] (tokens 0-2)        -> first 0, n 1
    //   doc1: off 3, tokens 3-6 cross the 4-boundary  -> first 0, n 2
    //   doc2: off 7, tokens 7-8 cross into chunk 2    -> first 1, n 2
    // plus an empty doc and a second source restarting at offset 0
    val docs = Seq(
      (0L, "a b c", "en", "web"), (1L, "d e f g", "en", "web"),
      (2L, "h i", "en", "web"), (3L, " ", "en", "web"),
      (10L, "x y z w v", "en", "books"))
    withCorpusDir(docs) { dir =>
      val out = Pipeline.packSequences(spark, dir, ctxLen = 4L).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("start_off"), r.getAs[Long]("first_chunk"),
            r.getAs[Long]("n_chunks")))).toMap
      assert(out(0L) === ((0L, 0L, 1L)))
      assert(out(1L) === ((3L, 0L, 2L)))
      assert(out(2L) === ((7L, 1L, 2L)))
      assert(out(3L) === ((9L, 2L, 0L))) // empty doc: position, no chunks
      assert(out(10L) === ((0L, 0L, 2L))) // new source restarts
    }
  }

  test("packSequences: two-level prefix sum equals a single global window per source") {
    val docs = (0L until 300L).map(i =>
      (i, ("tok " * ((i % 7).toInt + 1)).trim, "en", if (i % 3 == 0) "web" else "books"))
    withCorpusDir(docs) { dir =>
      // tiny bucketSize forces many buckets; must equal the bucketSize=∞ result
      val fine = Pipeline.packSequences(spark, dir, ctxLen = 16L, bucketSize = 10L)
        .collect().map(_.toString).sorted.toSeq
      val coarse = Pipeline.packSequences(spark, dir, ctxLen = 16L, bucketSize = 1000000L)
        .collect().map(_.toString).sorted.toSeq
      assert(fine === coarse)
      // and no window partitions on source alone in the doc-level pass:
      // the widest sort key is (source, bucket)
      val plan = Pipeline.packSequences(spark, dir, ctxLen = 16L, bucketSize = 10L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("bucket"), "bucketed decomposition missing from plan")
    }
  }

  test("writeShards: one dir+file per shard, membership deterministic, rows preserved") {
    val docs = (0L until 120L).map(i =>
      (i, s"doc $i body", "en", "web"))
    withCorpusDir(docs) { dir =>
      val out1 = java.nio.file.Files.createTempDirectory("shards1").toString
      val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
      try {
        val df = spark.read.parquet(s"$dir/documents.parquet")
        Pipeline.writeShards(df, out1, nShards = 4)
        // input arrives differently partitioned the second time
        Pipeline.writeShards(df.repartition(13), out2, nShards = 4)
        val dirs = new java.io.File(out1).listFiles()
          .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
        assert(dirs.length === 4)
        // exactly one data file per shard directory
        dirs.foreach { d =>
          val files = new java.io.File(s"$out1/$d").listFiles()
            .filter(_.getName.endsWith(".parquet"))
          assert(files.length === 1, s"$d has ${files.length} files")
        }
        def membership(o: String) = spark.read.parquet(o)
          .select($"doc_id", $"shard".cast("long"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val m1 = membership(out1)
        assert(m1.size === 120)
        assert(m1 === membership(out2), "shard membership must not depend on input partitioning")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out1))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out2))
      }
    }
  }

  test("labelCentroids: vectors identical to their centroid have sim 1; orthogonal outlier doesn't") {
    val dir = java.nio.file.Files.createTempDirectory("centroids").toString
    try {
      // label 0: two identical vectors -> centroid == vector -> sim 1
      // label 1: two orthogonal vectors -> sim to mean = cos(45 deg)
      Seq(
        (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
        (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
        (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
        (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1)
      ).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.labelCentroids(spark, dir).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim_centroid")).toMap
      assert(math.abs(out(0L) - 1.0) < 1e-12)
      assert(math.abs(out(1L) - 1.0) < 1e-12)
      assert(math.abs(out(2L) - math.sqrt(0.5)) < 1e-12)
      assert(math.abs(out(3L) - math.sqrt(0.5)) < 1e-12)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("fitTransform: val/test values never enter the fit (leakage guard)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("fitxf").toString
    try {
      // pass 1: learn which doc_ids the (data-independent) split
      // sends to train
      val ids = (0L until 20L)
      ids.map(i => (i, "t", "en", "s", 100L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val train = graft.operators.Pipeline.stratifiedSplit(spark, dir)
        .filter(col("split") === "train")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(train.nonEmpty && train.size < 20)
      // pass 2: all TRAIN docs share n_chars=100; val/test differ
      // wildly. If the fit saw only train, sigma=0 -> every z null.
      ids.map(i => (i, "t", "en", "s", if (train(i)) 100L else 999L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.operators.Pipeline.fitTransform(spark, dir).collect()
      assert(out.length === 20)
      assert(out.forall(r => r.isNullAt(r.fieldIndex("z"))),
        "val/test values leaked into the normalization fit")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("nucleusSelect: smallest top prefix covering p of the mass, per source") {
    // src A lengths: 60, 30, 10 (total 100, p=50): keep 60 only
    //   (cum_before: 0 < 50 -> keep; 60 >= 50 -> drop; 90 -> drop)
    // src B lengths: 10, 10 (total 20): keep first 10 only
    val rows = Seq(
      (1L, "x" * 60, "en", "A"), (2L, "x" * 30, "en", "A"),
      (3L, "x" * 10, "en", "A"), (4L, "x" * 10, "en", "B"),
      (5L, "x" * 10, "en", "B"))
    withCorpusDir(rows) { dir =>
      val out = graft.operators.Pipeline.nucleusSelect(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("cum_chars"), r.getAs[Boolean]("keep")))).toMap
      assert(out === Map(
        1L -> ((60L, true)), 2L -> ((90L, false)), 3L -> ((100L, false)),
        4L -> ((10L, true)), 5L -> ((20L, false))))
    }
  }

  test("negativeSample: exactly k negatives per anchor, never self, deterministic") {
    val rows = (1L to 20L).map(i => (i, s"doc $i", "en", "src"))
    withCorpusDir(rows) { dir =>
      def run() = graft.operators.Pipeline.negativeSample(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("j"),
          r.getAs[Long]("neg_doc_id")))
      val out = run()
      assert(out.length === 20 * 4)
      out.groupBy(_._1).foreach { case (a, ns) =>
        assert(ns.map(_._2).sorted.toSeq === Seq(0, 1, 2, 3), s"anchor $a")
        assert(ns.forall(_._3 != a), s"anchor $a drew itself")
        assert(ns.forall(x => x._3 >= 1L && x._3 <= 20L))
      }
      // negatives spread over the corpus, not stuck on one position
      assert(out.map(_._3).distinct.length > 5)
      assert(run().toSet === out.toSet)
    }
  }

  test("epochShuffle: each epoch is a permutation, epochs differ, runs agree") {
    val rows = (1L to 40L).map(i => (i, s"doc $i", "en", "src"))
    withCorpusDir(rows) { dir =>
      def run() = graft.operators.Pipeline.epochShuffle(spark, dir).collect()
        .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("pos")))
      val out = run()
      val byEpoch = out.groupBy(_._1)
      assert(byEpoch.keySet === Set(0, 1))
      byEpoch.values.foreach { es =>
        assert(es.map(_._3).sorted.toSeq === (1L to 40L)) // a permutation
      }
      val order = (e: Int) => byEpoch(e).sortBy(_._3).map(_._2).toSeq
      assert(order(0) !== order(1), "epochs must reshuffle")
      assert(order(0) !== (1L to 40L), "epoch 0 must not be identity order")
      assert(run().toSet === out.toSet) // hash-derived, not RNG
    }
  }
}
