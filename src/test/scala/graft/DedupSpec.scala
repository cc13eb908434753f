package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHash
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def withDocsDir(texts: Seq[String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    try {
      docsDf(texts).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("polyHash matches the hand-computed fold for 'abc'") {
    val got = docsDf(Seq("x"))
      .select(TextHash.polyHash(lit("abc")).as("h")).head().getLong(0)
    val want = Seq('a', 'b', 'c').foldLeft(0L)((acc, c) =>
      (acc * 31 + c.toInt) % TextHash.P)
    assert(got === want)
  }

  test("wordShingles: 3-grams in order; short docs give empty array") {
    val out = docsDf(Seq("a b c d", "a b"))
      .select($"doc_id",
        TextHash.wordShingles(TextHash.tokens($"text")).as("sh"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) === Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1) === Seq.empty)
  }

  test("minhash: identical docs share the full 16-column signature") {
    val d = docsDf(Seq("w1 w2 w3 w4 w5 w6", "w1 w2 w3 w4 w5 w6"))
    val sig = Dedup.minhashSignatures(spark, d).orderBy("doc_id").collect()
    assert(sig.length === 2)
    assert(sig(0).length === 17) // doc_id + mh1..mh16
    assert(sig(0).toSeq.tail === sig(1).toSeq.tail)
  }

  test("minhashLsh finds a planted near-duplicate, not the unrelated doc") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 39).map(i => s"tok$i") :+ "tokX").mkString(" ")
    val other = (100 to 140).map(i => s"zzz$i").mkString(" ")
    withDocsDir(Seq(base, near, other)) { dir =>
      val rows = Dedup.minhashLsh(spark, dir).collect()
      val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)))
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
      val est = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
        .get.getAs[Double]("est_jaccard")
      assert(est > 0.5)
    }
  }

  test("simhash: identical token multisets hash identically; disjoint differ") {
    val d = docsDf(Seq("aa bb aa cc", "cc aa bb aa", "xx yy zz qq"))
    val sig = Dedup.simhashSignatures(spark, d)
      .orderBy("doc_id").collect().map(_.getAs[Long]("simhash"))
    assert(sig(0) === sig(1))
    assert(sig(0) !== sig(2))
  }

  test("simhashPairs: near-identical docs collide with small hamming") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 58).map(i => s"tok$i") ++ Seq("aA", "bB")).mkString(" ")
    val far = (200 to 260).map(i => s"qqq$i").mkString(" ")
    withDocsDir(Seq(base, near, far)) { dir =>
      val pairs = Dedup.simhashPairs(spark, dir, maxHamming = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)))
      assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
    }
  }

  test("ngramJaccard: exact duplicate scores 1.0; sub-threshold pair drops") {
    val a = "one two three four five six seven"
    withDocsDir(Seq(a, a, "one two three nine ten eleven twelve")) { dir =>
      val rows = Dedup.ngramJaccard(spark, dir, minJaccard = 0.5).collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 0L && rows.head.getLong(1) === 1L)
      assert(rows.head.getAs[Double]("jaccard") === 1.0)
    }
  }
}
