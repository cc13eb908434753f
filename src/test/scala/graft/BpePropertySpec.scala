package graft

import org.apache.spark.sql.functions.col

/** Randomized cross-check of the relational BPE machinery against a
  * direct sequential reference implementation (Sennrich et al. 2016
  * §3.2 as straight-line Scala): the run-parity greedy non-overlap
  * trick, the weighted pair counts, the (count, left, right)
  * tie-break, and the frozen-merge replay must agree with the
  * sequential algorithm on ANY corpus, not just the hand-traced
  * fixtures. Seeded deterministic corpora (the PipelinePropertySpec
  * convention) keep the suite reproducible; a tiny alphabet forces
  * dense pair collisions, same-symbol runs and tie-breaks — exactly
  * the cases where the relational form could drift.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference ----

  private def refMerge(syms: Vector[String], l: String,
                       r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2 // greedy left-to-right, non-overlapping
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Train `merges` rounds sequentially; returns the merge rows and
    * the final per-word segmentation. */
  private def refTrain(vocab: Map[String, Long], merges: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var seg: Map[String, Vector[String]] =
      vocab.map { case (w, _) => w -> (w.map(_.toString).toVector :+ "</w>") }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- seg; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + vocab(w)
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties -> lexicographically smallest (left, right);
        // ASCII alphabet, so Scala string order == the engines' binary
        val ((bl, br), c) =
          counts.toSeq.sortBy { case ((l, rr), n) => (-n, l, rr) }.head
        out += ((bl, br, c))
        seg = seg.map { case (w, s) => w -> refMerge(s, bl, br) }
        r += 1
      }
    }
    (out.toSeq, seg)
  }

  private def refReplay(words: Set[String],
                        merges: Seq[(String, String)])
      : Map[String, Vector[String]] =
    words.map { w =>
      var s = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (l, r) => s = refMerge(s, l, r) }
      w -> s
    }.toMap

  private def tokens(doc: String): Seq[String] =
    doc.split("\\s+").filter(_.nonEmpty).toSeq

  private def vocabOf(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(tokens).groupBy(identity).view.mapValues(_.size.toLong).toMap

  // ---- corpus generator (seeded, deterministic) ----

  private def randCorpus(seed: Long, nDocs: Int, alphabet: String)
      : Seq[String] = {
    val rng = new java.util.Random(seed)
    def word() = (1 to (1 + rng.nextInt(5)))
      .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    (1 to nDocs).map(_ => (1 to (3 + rng.nextInt(8))).map(_ => word())
      .mkString(" "))
  }

  private def withDocsDir(texts: Seq[String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("bpeprop").toString
    try {
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bpeTrain == sequential reference on seeded random corpora") {
    for (seed <- Seq(7L, 19L, 101L, 577L)) {
      val docs = randCorpus(seed, nDocs = 3, alphabet = "ab")
      val merges = 2 + (seed % 3).toInt // 2..4 rounds
      val (refRows, _) = refTrain(vocabOf(docs), merges)
      withDocsDir(docs) { dir =>
        val got = graft.operators.TextAnalysis.bpeTrain(spark, dir, merges)
          .collect()
          .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
            r.getAs[Long]("pair_count"))).toSeq
        assert(got === refRows, s"seed=$seed docs=$docs")
      }
    }
  }

  test("bpeEncode fertility == sequential reference on seeded random corpora") {
    for (seed <- Seq(23L, 1009L)) {
      val docs = randCorpus(seed, nDocs = 4, alphabet = "abc")
      val merges = 3
      val (_, seg) = refTrain(vocabOf(docs), merges)
      val want = docs.zipWithIndex.map { case (d, i) =>
        val tk = tokens(d)
        (i.toLong, tk.size.toLong, tk.map(w => seg(w).size.toLong).sum)
      }
      withDocsDir(docs) { dir =>
        val got = graft.operators.TextAnalysis.bpeEncode(spark, dir, merges)
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
            r.getAs[Long]("n_subwords"))).sortBy(_._1).toSeq
        assert(got === want, s"seed=$seed docs=$docs")
      }
    }
  }

  test("encodeFrozenOn == sequential train-then-replay on disjoint corpora") {
    for (seed <- Seq(41L, 271L)) {
      val existing = randCorpus(seed, nDocs = 3, alphabet = "ab")
      // a different alphabet mix guarantees genuinely unseen words
      val incoming = randCorpus(seed + 1, nDocs = 2, alphabet = "abc")
      val merges = 3
      val (refMerges, _) = refTrain(vocabOf(existing), merges)
      val seg = refReplay(incoming.flatMap(tokens).toSet,
        refMerges.map(m => (m._1, m._2)))
      val want = incoming.zipWithIndex.map { case (d, i) =>
        val tk = tokens(d)
        (100L + i, tk.size.toLong, tk.map(w => seg(w).size.toLong).sum)
      }
      val exDf = existing.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val incDf = incoming.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis
        .encodeFrozenOn(exDf, incDf, merges).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_subwords"))).sortBy(_._1).toSeq
      assert(got === want, s"seed=$seed existing=$existing incoming=$incoming")
    }
  }
}
