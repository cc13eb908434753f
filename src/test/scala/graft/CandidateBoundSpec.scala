package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Scale-regression guards for the near-dup family's candidate
  * generation: the blocking geometries must keep random-pair collision
  * volume far below the quadratic regimes the 100 TB design forbids
  * (n²/64-shaped byte-blocking, hot-shingle d² blowup, coarse LSH
  * buckets). These fail loudly if a default geometry degrades.
  */
class CandidateBoundSpec extends SparkSpec {
  import spark.implicits._

  private def withDocsDir(texts: Seq[String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("cand").toString
    try {
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("simhash 16-bit bands: random-corpus candidate volume is ~n²/16384, not n²/64") {
    val rng = new java.util.Random(7)
    val n = 500
    val docs = Seq.fill(n)(Seq.fill(20)(s"w${rng.nextInt(5000)}").mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(spark, docs)
    val blocks = sig.select(col("doc_id"),
      posexplode(array(
        col("sim_lo").bitwiseAND(lit(65535L)),
        shiftright(col("sim_lo"), 16),
        col("sim_hi").bitwiseAND(lit(65535L)),
        shiftright(col("sim_hi"), 16))).as(Seq("b", "bk")))
    val candidates = blocks.groupBy("b", "bk").count()
      .collect().map { r => val c = r.getLong(2); c * (c - 1) / 2 }.sum
    val oldGeometry = n.toLong * n / 64 // what 8-bit blocks allowed
    assert(candidates < n,
      s"16-bit band collisions must be rare: got $candidates candidates " +
        s"for $n random docs (old 8-bit geometry bound: $oldGeometry)")
  }

  test("ngramJaccard df cap: a stopword shingle shared by all docs cannot create pairs") {
    val common = (1 to 30).map(i => s"common$i").mkString(" ")
    val heavy = (0 until 60).map(i => s"$common unique${i}a unique${i}b unique${i}c")
    val dupText = "genuinely unique duplicated document body with many distinct words"
    withDocsDir(heavy ++ Seq(dupText, dupText)) { dir =>
      // the hot set is exactly the common-prefix shingles (df=60 > 10)
      val dropped = Dedup.droppedShingles(spark, dir, maxDf = 10L).count()
      assert(dropped >= 28, s"common shingles must be dropped, got $dropped")
      // with the cap, candidate volume from the hot shingle is gone:
      // join input pairs = sum over kept shingles of df(df-1)/2
      val hot = Dedup.droppedShingles(spark, dir, maxDf = 10L).select("h")
      val kept = Dedup.shingleHashes(
          spark.read.parquet(s"$dir/documents.parquet"))
        .join(broadcast(hot), Seq("h"), "left_anti")
      val candPairs = kept.groupBy("h").count()
        .collect().map { r => val c = r.getLong(1); c * (c - 1) / 2 }.sum
      val uncapped = 30L * 60 * 59 / 2 // common shingles alone, uncapped
      assert(candPairs < 200,
        s"capped candidate volume must be tiny: $candPairs (uncapped ~$uncapped)")
      // and a genuine duplicate pair still comes through at jaccard 1.0
      val pairs = Dedup.ngramJaccard(spark, dir, minJaccard = 0.5, maxDf = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.toSeq === Seq((60L, 61L, 1.0)))
    }
  }

  test("qgram prefix filter: hot boilerplate gram cannot create quadratic candidates") {
    // 80 docs sharing a 24-char boilerplate header (17 hot 8-grams,
    // df=80 each) followed by unique tails. Without Ed-Join prefix
    // filtering every hot gram contributes d²/2 ≈ 3160 pairs × 17
    // grams; with it, hot grams sort LAST in the (df, gram) order and
    // fall out of every 33-gram prefix, so candidate volume collapses
    // to the genuinely-similar pairs.
    val rng = new java.util.Random(83)
    val header = "COMMON-BOILERPLATE-HDR__" // 24 chars
    def tail() = Seq.fill(40)(('a' + rng.nextInt(26)).toChar).mkString
    val uniques = Seq.fill(78)(header + tail())
    val dupBase = header + tail()
    val dup = dupBase.updated(30, 'X').updated(50, 'X') // 2 edits apart
    val texts = uniques ++ Seq(dupBase, dup)
    val dir = java.nio.file.Files.createTempDirectory("qgramhot").toString
    try {
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val cands = Dedup.qgramCandidates(spark, dir).count()
      val uncapped = 17L * texts.length * (texts.length - 1) / 2
      assert(cands < texts.length,
        s"prefix-filtered candidates must stay ~linear: got $cands " +
          s"for ${texts.length} boilerplate docs (unfiltered ~$uncapped)")
      // and the planted distance-2 pair still comes through end-to-end
      val pairs = Dedup.qgramEditJoin(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.contains((78L, 79L, 2L)),
        s"planted dup pair must survive filtering: got ${pairs.toSeq}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("12-plane multi-probe LSH: random-corpus candidate volume stays ~n²·13/2/4096") {
    val rng = new java.util.Random(13)
    val n = 500
    val planes = Similarity.hyperplanes()
    val vecs = Seq.fill(n)(Array.fill(64)(rng.nextGaussian()))
    val buckets = vecs.map { v =>
      planes.zipWithIndex.map { case (pl, i) =>
        if (pl.zip(v).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
      }.sum
    }
    var candidates = 0L
    for (i <- 0 until n; j <- (i + 1) until n)
      if (java.lang.Long.bitCount((buckets(i) ^ buckets(j)).toInt) <= 1)
        candidates += 1
    val oldGeometry = n.toLong * n / 2 / 64 // 6-plane/64-bucket volume
    assert(candidates < 1000,
      s"multi-probe 12-plane candidates must stay bounded: got $candidates " +
        s"(6-plane geometry expectation ~$oldGeometry)")
  }
}
