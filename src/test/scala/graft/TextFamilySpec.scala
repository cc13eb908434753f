package graft

import graft.operators.TextAnalysis

class TextFamilySpec extends SparkSpec {
  import spark.implicits._

  private def withDocsDir(texts: Seq[String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("textfam").toString
    try {
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("langId: marker-dominant docs classify; no markers gives 'und'; tie prefers en") {
    withDocsDir(Seq(
      "el gato de la casa es negro y bonito",
      "the cat of the house is black and nice",
      "zzz qqq www rrr",
      "the la"  // en=1, es=1, fr=1 tie -> en
    )) { dir =>
      val out = TextAnalysis.langId(spark, dir).orderBy("doc_id")
        .collect().map(_.getAs[String]("pred_lang"))
      assert(out === Array("es", "en", "und", "en"))
    }
  }

  test("qualityScore: hand-computed ratios for a tiny doc") {
    withDocsDir(Seq("the cat sat")) { dir =>
      val r = TextAnalysis.qualityScore(spark, dir).head()
      assert(r.getAs[Long]("n_tokens") === 3L)
      assert(math.abs(r.getAs[Double]("avg_token_len") - 3.0) < 1e-12)
      assert(math.abs(r.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-12)
      assert(r.getAs[Double]("punct_ratio") === 0.0)
      val want = 0.4 * (3.0 / 100) + 0.3 * (1 - 1.0 / 3) + 0.3 * (3.0 / 8)
      assert(math.abs(r.getAs[Double]("quality_score") - want) < 1e-12)
    }
  }

  test("bpeTokenStats: letter runs, digit runs, and symbols count separately") {
    withDocsDir(Seq("ab1 c!")) { dir =>
      val r = TextAnalysis.bpeTokenStats(spark, dir).head()
      assert(r.getAs[Long]("n_ws_tokens") === 2L)
      assert(r.getAs[Long]("n_bpe_tokens") === 4L) // ab | 1 | c | !
      assert(math.abs(r.getAs[Double]("chars_per_token") - 6.0 / 4) < 1e-12)
    }
  }

  test("fingerprints: identical docs share the exact fingerprint set") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    withDocsDir(Seq(t, t, "completely different content here that shares nothing at all")) { dir =>
      val fps = TextAnalysis.fingerprints(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
      assert(fps(0L) === fps(1L))
      assert(fps(0L) !== fps(2L))
    }
  }

  test("fingerprints: winnow keeps at most one fp per window position and is shift-stable inside") {
    // A doc shorter than k yields no rows.
    withDocsDir(Seq("short")) { dir =>
      assert(TextAnalysis.fingerprints(spark, dir).count() === 0L)
    }
  }
}
