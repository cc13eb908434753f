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

  test("lshTuning: identical docs survive every banding; candidates shrink with band length") {
    // Two identical docs (J = 1: collide in every band of every
    // config, always confirmed), one unrelated doc.
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    withDocsDir(Seq(a, a, "zz yy xx ww vv uu tt ss rr qq pp oo")) { dir =>
      val out = Dedup.lshTuning(spark, dir).collect()
        .map(r => r.getAs[Long]("rows_per_band") ->
          ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_confirmed")))).toMap
      assert(out.keySet === Set(2L, 4L, 8L, 16L))
      // the exact-dup pair is a confirmed candidate at every length
      assert(out.values.forall { case (cand, conf) => cand >= 1 && conf >= 1 })
      // longer bands can only lose candidates (banding is coarser)
      val cands = Seq(2L, 4L, 8L, 16L).map(out(_)._1)
      assert(cands === cands.sorted.reverse, s"not monotone: $cands")
    }
  }

  test("shingleContainment: embedded document scores 1.0 where jaccard misses it") {
    // doc 1 is a strict prefix of doc 0 (10 vs 4 shingles): containment
    // of the smaller is exact 1.0, jaccard only 4/10
    val big = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val part = "w1 w2 w3 w4 w5 w6"
    withDocsDir(Seq(big, part, "zz yy xx ww vv")) { dir =>
      val out = Dedup.shingleContainment(spark, dir).collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getAs[Long]("doc_a") === 0L && r.getAs[Long]("doc_b") === 1L)
      assert(r.getAs[Long]("inter") === 4L)
      assert(r.getAs[Long]("sz_a") === 10L && r.getAs[Long]("sz_b") === 4L)
      assert(r.getAs[Double]("containment") === 1.0)
      // and the jaccard operator at its default threshold does NOT pair them
      val j = Dedup.ngramJaccard(spark, dir).collect()
      assert(!j.exists(x => x.getAs[Long]("doc_a") === 0L &&
        x.getAs[Long]("doc_b") === 1L))
    }
  }

  test("editDistancePairs: blocked Levenshtein pairs, lang-disjoint") {
    val base = "hello world this is a doc"       // 25 chars, band 1
    val near = "hello world this is a dox"       // dist 1 from base
    val far = "x" * 80                           // band 5: never a pair
    val rows = Seq(
      (0L, base, "en"), (1L, near, "en"),
      (2L, near, "fr"),                          // lang blocks the pair
      (3L, far, "en"))
      .map { case (id, t, lg) => (id, t, lg, t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("editdist").toString
    try {
      rows.toDF("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = Dedup.editDistancePairs(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("dist")))
      assert(out.toSeq === Seq((0L, 1L, 1L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dedupDecisions: cluster reps kept, members dropped, singletons kept") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    withDocsDir(Seq(a, a, "totally different words with zero shingle overlap here")) { dir =>
      val out = Dedup.dedupDecisions(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep")))).toMap
      assert(out(0L) === ((0L, true)))
      assert(out(1L) === ((0L, false)))
      assert(out(2L) === ((2L, true)))
    }
  }

  test("qgramEditJoin: complete recall vs brute-force DP, incl. short class") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = dp(i); dp(i) = cur
        }
      }
      dp(a.length)
    }
    val base = "abcdefgh" * 8                       // 64 chars
    val d4 = base.updated(3, 'X').updated(19, 'X')  // 4 scattered edits
      .updated(37, 'X').updated(55, 'X')
    val d5 = base.updated(3, 'X').updated(19, 'X')  // 5 edits: excluded
      .updated(37, 'X').updated(55, 'X').updated(60, 'X')
    val texts = Seq(base, d4, d5, "ab", "abc", "zzzz")
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("qgram").toString
    try {
      rows.toDF("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Dedup.qgramEditJoin(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("dist"))).toSet
      val want = (for {
        i <- texts.indices; j <- texts.indices if i < j
        d = lev(texts(i).take(64), texts(j).take(64)) if d <= 4
      } yield (i.toLong, j.toLong, d.toLong)).toSet
      assert(got === want)
      assert(want.contains((0L, 1L, 4L)), "distance-4 pair must exist")
      assert(want.exists(p => p._1 == 3L && p._2 == 4L), "short-class pair")
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
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("sim_lo"), r.getAs[Long]("sim_hi")))
    assert(sig(0) === sig(1))
    assert(sig(0) !== sig(2))
    // 32-bit halves: the packed values never exceed the BIGINT-safe range
    sig.foreach { case (lo, hi) =>
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32))
    }
  }

  test("simhashPairs: recall is exact within the pigeonhole radius") {
    // candidate "near" docs: base with one token duplicated. Pick one
    // whose 64-bit hamming lands in [1, 3] — inside that radius the
    // 4×16-bit band recall is EXACT (≤3 flipped bits leave ≥1 of the 4
    // bands untouched), so the pair MUST be found.
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val variants = (1 to 30).map(i => base + s" tok$i")
    val far = (500 to 700).map(i => s"qqq$i").mkString(" ")
    val sigs = Dedup.simhashSignatures(spark,
        docsDf(base +: variants)).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("sim_lo"), r.getAs[Long]("sim_hi")))
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val hs = sigs.tail.map(s => hamming(sigs.head, s))
    val pick = hs.indexWhere(h => h >= 1 && h <= 3)
    assert(pick >= 0, s"no variant within radius 3 (hammings: ${hs.mkString(",")})")
    withDocsDir(Seq(base, variants(pick), far)) { dir =>
      val pairs = Dedup.simhashPairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)), s"hamming ${hs(pick)} pair must be recalled")
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

  test("connectedComponents: chain needs multi-round propagation; components separate") {
    // a 16-node chain 20-21-...-35 (so the min label must travel the
    // whole diameter — exercises the pointer-jump shortcut) plus an
    // isolated pair (10, 11)
    val chain = (20L until 35L).map(i => (i + 1, i)) // reversed pairs
    val pairs = (chain :+ ((10L, 11L))).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (20L to 35L).map(_ -> 20L).toMap ++
      Map(10L -> 10L, 11L -> 10L)
    assert(out === expected)
  }

  test("connectedComponents equals union-find on seeded random graphs") {
    val rng = new java.util.Random(421984L)
    for (trial <- 1 to 5) {
      val n = 12 + rng.nextInt(15)
      val edges = Seq.fill(6 + rng.nextInt(14)) {
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // reference: union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val expected = touched.map(v =>
        v -> touched.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial, edges=$edges")
    }
  }

  test("connectedComponentsStar equals union-find on seeded random graphs") {
    val rng = new java.util.Random(73114L)
    for (trial <- 1 to 5) {
      val n = 12 + rng.nextInt(15)
      val edges = Seq.fill(6 + rng.nextInt(14)) {
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val expected = touched.map(v =>
        v -> touched.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
      val got = Dedup.connectedComponentsStar(edges.toDF("doc_a", "doc_b"))._1
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial, edges=$edges")
    }
  }

  test("connectedComponentsStar: adversarial long chain, O(log n) rounds") {
    // a 10k-node path is the worst case for plain min-label
    // propagation (diameter rounds); star contraction must finish in
    // O(log n) — the scale argument for 100 TB dup chains.
    val n = 10000
    val pairs = (0L until (n - 1).toLong).map(i => (i + 1, i))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsStar(pairs)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === (0L until n.toLong).map(_ -> 0L).toMap)
    // ≤ log2(n) contracting rounds; the final round is the fixpoint-
    // verification pass (checksum unchanged), so the loop count is +1.
    val bound = (math.log(n) / math.log(2)).ceil.toInt + 1 // 14 + verify
    assert(rounds <= bound,
      s"star contraction took $rounds rounds on a $n-path (bound $bound)")
  }

  test("connectedComponentsStar: empty edge set and self-loops degenerate cleanly") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponentsStar(empty)._1.collect().isEmpty)
    // self-loops carry no connectivity and must not invent clusters
    val selfs = Seq((5L, 5L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponentsStar(selfs)._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(5L -> 5L, 6L -> 5L))
  }

  test("dupSpans: planted cross-doc 8-token span is counted, unique/short docs are not") {
    val shared = "one two three four five six seven eight" // exactly 8 tokens
    val docA = s"$shared plus unique tail words for doc alpha"
    val docB = s"prefix words here then $shared and more beyond"
    val uniq = "entirely distinct vocabulary nothing shared across any doc of corpus"
    val short = "too few tokens"                           // < 8 tokens: no spans
    withDocsDir(Seq(docA, docB, uniq, short)) { dir =>
      val out = Dedup.dupSpans(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_spans")))).toMap
      // docA: 15 tokens -> 8 spans; only the window equal to `shared`
      // (position 0) also appears in docB
      assert(out(0L) === ((8L, 1L)))
      assert(out(1L)._2 === 1L)
      assert(out(2L)._2 === 0L)
      assert(out(3L) === ((0L, 0L)))
      val fracs = Dedup.dupSpans(spark, dir)
        .filter(col("doc_id") === 3L).select("dup_frac").collect()
      assert(fracs.head.isNullAt(0), "0-span doc must have NULL dup_frac")
    }
  }

  test("spanHashes matches an independent token-fold for n=1,2,5") {
    val text = "Alpha beta GAMMA  delta epsilon zeta"
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def tokHash(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((a, c) =>
        java.lang.Math.floorMod(a * 31 + c, TextHash.P))
    for (n <- Seq(1, 2, 5)) {
      val expected = toks.sliding(n).filter(_.length == n)
        .map(_.map(tokHash).reduceLeft((a, h) =>
          java.lang.Math.floorMod(a * 31 + h, TextHash.P)))
        .toSeq
      val got = Seq(text).toDF("t")
        .select(TextHash.spanHashes(col("t"), n).as("sh"))
        .head().getSeq[Long](0)
      assert(got === expected, s"n=$n")
    }
  }

  test("dupClusters: planted near-dup trio collapses to one cluster id") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    withDocsDir(Seq(a, a, a, "totally unrelated words here nothing shared at all ok")) { dir =>
      val out = Dedup.dupClusters(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
    }
  }

  test("incrementalDedup: incoming copy of existing drops; unique incoming ingests; " +
    "incoming-incoming pairs never counted") {
    import org.apache.spark.sql.functions._
    // discover the deterministic membership for ids 0..29
    val flags = spark.range(0, 30).select(col("id"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash.polyHash(
          concat(lit("inc:"), col("id").cast("string")))) % 5 === 0L).as("inc"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val incIds = (0L until 30L).filter(flags(_))
    val exIds = (0L until 30L).filterNot(flags(_))
    assert(incIds.size >= 2 && exIds.size >= 2)
    val (dupInc, uniqInc) = (incIds.head, incIds(1))
    val dupEx = exIds.head
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val texts = (0L until 30L).map { id =>
      if (id == dupInc || id == dupEx) shared
      else if (incIds.drop(2).contains(id) && flags(id))
        shared // extra incoming copies: must match EXISTING only
      else (1 to 12).map(j => s"w${id}x$j").mkString(" ")
    }
    withDocsDir(texts) { dir =>
      val out = graft.operators.Dedup.incrementalDedup(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_confirmed"),
            Option(r.get(r.fieldIndex("best_match"))),
            r.getAs[String]("decision")))).toMap
      assert(out.keySet === incIds.toSet) // one row per incoming doc
      val (_, nConf, best, dec) = out(dupInc)
      assert(dec === "drop" && nConf >= 1L)
      // best match is the EXISTING copy, never a fellow incoming copy
      assert(best === Some(dupEx))
      assert(out(uniqInc) === ((0L, 0L, None, "ingest")))
    }
  }

  test("sortedNeighborhood: exactly the w-successor pairs in prefix order; dup pair scores 16/16") {
    // Prefix-sorted order is deterministic: texts chosen so the
    // normalized 12-char keys sort as aaa < aab < mmm(=mmm2) < zzz.
    // The two mmm docs are identical -> full signature agreement.
    val mmm = "mmm common body " + (1 to 25).map(i => s"w$i").mkString(" ")
    val texts = Seq(
      "aaa alpha " + (1 to 20).map(i => s"a$i").mkString(" "), // doc 0
      "aab beta " + (1 to 20).map(i => s"b$i").mkString(" "),  // doc 1
      mmm,                                                      // doc 2
      mmm,                                                      // doc 3
      "zzz omega " + (1 to 20).map(i => s"z$i").mkString(" ")) // doc 4
    withDocsDir(texts) { dir =>
      val out = Dedup.sortedNeighborhood(spark, dir, w = 2).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          ((r.getAs[Long]("rank_gap"), r.getAs[Long]("n_match")))).toMap
      // rank order: 0,1,2,3,4 (doc_id breaks the mmm tie); w=2 pairs:
      val expected = Set((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L),
        (2L, 3L), (2L, 4L), (3L, 4L))
      assert(out.keySet === expected,
        s"candidate set wrong: ${out.keySet.toSeq.sorted}")
      assert(out((2L, 3L))._1 === 1L)
      assert(out((2L, 3L))._2 === 16L, "identical docs must agree on all 16 slots")
      // disjoint-vocabulary neighbors agree on (almost) nothing
      assert(out((3L, 4L))._2 <= 2L)
    }
  }

  test("sortedNeighborhood pair-count property: exactly sum(min(w, n - rank)) candidates with signatures") {
    // 6 docs, all long enough to carry shingle signatures: pair count
    // must be exactly Σ_r min(w, n − r) regardless of key content.
    val texts = (0 until 6).map(i =>
      s"t$i " + (1 to 15).map(j => s"w$i$j").mkString(" "))
    withDocsDir(texts) { dir =>
      for (w <- Seq(1, 2, 4)) {
        val n = texts.length
        val expected = (1 to n).map(r => math.min(w, n - r)).sum
        val got = Dedup.sortedNeighborhood(spark, dir, w = w).count()
        assert(got === expected.toLong, s"w=$w")
      }
    }
  }

  test("blockingRecall: LSH catches the cross-prefix near-dup the sorted window misses") {
    // Truth pairs: (0,1) identical 'aaa'-prefixed docs, and (0,2)/(1,2)
    // where doc 2 shares the body but starts with 'zzz' — its sort rank
    // lands w+ positions away behind the fillers, so the w=2 window
    // cannot pair it with docs 0/1, while LSH bands (prefix-blind)
    // still collide on the shared shingles.
    val body = (1 to 24).map(i => s"common$i").mkString(" ")
    val texts = Seq(
      s"aaa $body", s"aaa $body", s"zzz $body",
      "bbb " + (1 to 12).map(i => s"b$i").mkString(" "),
      "ccc " + (1 to 12).map(i => s"c$i").mkString(" "),
      "ddd " + (1 to 12).map(i => s"d$i").mkString(" "),
      "eee " + (1 to 12).map(i => s"e$i").mkString(" "))
    withDocsDir(texts) { dir =>
      val truth = Dedup.ngramJaccard(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(truth === Set((0L, 1L), (0L, 2L), (1L, 2L)),
        s"fixture truth set unexpected: $truth")
      val out = Dedup.blockingRecall(spark, dir, w = 2).collect()
        .map(r => r.getAs[String]("scheme") ->
          ((r.getAs[Long]("n_truth"), r.getAs[Long]("n_hits"),
            r.getAs[Double]("recall")))).toMap
      assert(out.keySet === Set("lsh_bands", "sorted_neighborhood"))
      assert(out("lsh_bands") === ((3L, 3L, 1.0)))
      // only the adjacent identical pair survives the rank window
      assert(out("sorted_neighborhood") === ((3L, 1L, 1.0 / 3.0)))
    }
  }

  test("blockingRecall: releases its truth/candidate caches (no session residue)") {
    val texts = Seq(
      "aaa " + (1 to 24).map(i => s"x$i").mkString(" "),
      "aaa " + (1 to 24).map(i => s"x$i").mkString(" "),
      "bbb " + (1 to 12).map(i => s"y$i").mkString(" "))
    withDocsDir(texts) { dir =>
      // baseline = whatever earlier suite tests legitimately pinned
      // (e.g. localCheckpoints); the assertion is that q214 adds NO
      // new persistent RDDs of its own
      val before = spark.sparkContext.getPersistentRDDs.keySet
      // the audit is eager: by the time the call returns, all three
      // count() actions ran and both caches must already be released
      // (round-10 verdict: a library caller composing q214 into a
      // longer session leaked two cached tables per call)
      Dedup.blockingRecall(spark, dir, w = 2).collect()
      val leaked = spark.sparkContext.getPersistentRDDs -- before
      assert(leaked.isEmpty,
        s"q214 left cached tables behind: ${leaked.values.map(_.name)}")
    }
  }

  private def scrubRows(dir: String) =
    Dedup.spanScrub(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_removed_tokens"),
          r.getAs[String]("cleaned_text")))).toMap

  test("spanScrub: cross-doc duplicated span cut from the later doc only") {
    // the 8-gram 'a b c d e f g h' occurs at doc0 pos1 and doc1 pos3;
    // first occurrence (0,1) is canonical, so doc1 loses tokens 3..10
    withDocsDir(Seq(
      "a b c d e f g h x1 x2",
      "p q a b c d e f g h")) { dir =>
      val out = scrubRows(dir)
      assert(out(0L) === ((10L, 0L, 0L, "a b c d e f g h x1 x2")))
      assert(out(1L) === ((10L, 1L, 8L, "p q")))
    }
  }

  test("spanScrub: within-doc repeat is cut (unlike q109's distinct-doc gate)") {
    // 16 tokens, period 8: span(pos 9) duplicates span(pos 1); the
    // seven boundary-crossing spans (pos 2..8) are all unique
    val doc = ((1 to 8) ++ (1 to 8)).map(i => s"t$i").mkString(" ")
    withDocsDir(Seq(doc)) { dir =>
      val out = scrubRows(dir)
      assert(out(0L) === ((16L, 1L, 8L,
        (1 to 8).map(i => s"t$i").mkString(" "))))
    }
  }

  test("spanScrub: overlapping removal intervals union; 3x repeat keeps one copy") {
    // 24 tokens, period 8: every span at pos p duplicates pos p+8, so
    // first occurrences are pos 1..8 and removals pos 9..17 cover
    // tokens 9..24 as one union — exactly one copy survives
    val doc = ((1 to 8) ++ (1 to 8) ++ (1 to 8)).map(i => s"s$i").mkString(" ")
    withDocsDir(Seq(doc)) { dir =>
      val out = scrubRows(dir)
      assert(out(0L) === ((24L, 9L, 16L,
        (1 to 8).map(i => s"s$i").mkString(" "))))
    }
  }

  test("spanScrub: short docs (< w tokens) pass through untouched") {
    withDocsDir(Seq("one two three", "one two three")) { dir =>
      val out = scrubRows(dir)
      assert(out(0L) === ((3L, 0L, 0L, "one two three")))
      assert(out(1L) === ((3L, 0L, 0L, "one two three")))
    }
  }

  test("spanScrubIngest: index wins regardless of id order; within-batch rule holds") {
    import org.apache.spark.sql.functions._
    // recover the q204 'inc:' shard membership for ids 0..29, then
    // plant spans across the boundary instead of hand-tracing hashes
    val member = spark.range(30).select(col("id"),
      (graft.operators.Relational.scrambleMod(graft.functions.TextHash
        .polyHash(concat(lit("inc:"), col("id").cast("string"))))
        % 5 === 0L).as("inc")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val incIds = member.filter(_._2).keys.toSeq.sorted
    val incId = incIds.head
    val incId2 = incIds(1)
    // an EXISTING doc with id LARGER than incId: under q278's
    // first-occurrence rule the incoming copy would be canonical and
    // kept — the ingest variant must cut it anyway (the corpus owns
    // every indexed span)
    val exId = member.filter(kv => !kv._2 && kv._1 > incId).keys.min
    val shared = (1 to 8).map(i => s"sh$i").mkString(" ")
    val texts = (0L until 30L).map { id =>
      if (id == incId) s"pp qq $shared"
      else if (id == incId2) ((1 to 8) ++ (1 to 8)).map(i => s"w$i").mkString(" ")
      else if (id == exId) s"$shared tail1 tail2"
      else s"f${id}a f${id}b f${id}c" // < w tokens: no spans
    }
    withDocsDir(texts) { dir =>
      val out = Dedup.spanScrubIngest(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_removed_tokens"),
            r.getAs[String]("cleaned_text")))).toMap
      // only incoming docs appear
      assert(out.keySet === member.filter(_._2).keys.toSet)
      // cross-shard: cut from the incoming doc despite incId < exId
      assert(out(incId) === ((1L, 8L, "pp qq")))
      // within-batch repeat: q278's first-occurrence rule
      assert(out(incId2) === ((1L, 8L, (1 to 8).map(i => s"w$i").mkString(" "))))
      // untouched incoming docs pass through
      incIds.drop(2).foreach(id =>
        assert(out(id) === ((0L, 0L, s"f${id}a f${id}b f${id}c"))))
    }
  }

  test("spanIndexRoundTrip: derive -> write -> read -> identical scrub output") {
    // the q285 contract: scrubbing with the PERSISTED index must be
    // byte-identical to q282's inline-index scrub, and the sink/source
    // pair must preserve the exact distinct-hash set
    val shared = (1 to 8).map(i => s"rt$i").mkString(" ")
    val texts = (0L until 30L).map { id =>
      if (id % 3 == 0) s"$shared x${id}a x${id}b"
      else s"y${id}a y${id}b y${id}c y${id}d y${id}e y${id}f y${id}g y${id}h y${id}i"
    }
    withDocsDir(texts) { dir =>
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_removed_tokens"),
          r.getAs[String]("cleaned_text"))).sortBy(_._1).toSeq
      val inline = rows(Dedup.spanScrubIngest(spark, dir))
      val viaSink = rows(Dedup.spanIndexRoundTrip(spark, dir))
      assert(viaSink === inline)
      assert(inline.nonEmpty) // the split must leave incoming docs
      // the sink/source pair preserves the exact distinct-hash set
      val out = java.nio.file.Files
        .createTempDirectory("graft_span_index_spec").toString
      try {
        val idx = Dedup.indexForSpec(spark, dir)
        Dedup.writeSpanIndex(idx, out)
        val back = Dedup.readSpanIndex(spark, out)
        assert(back.collect().map(_.getLong(0)).sorted.toSeq ===
          idx.collect().map(_.getLong(0)).sorted.toSeq)
        // distinctness survives the round trip
        assert(back.count() === back.distinct().count())
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(out))
    }
  }

  test("spanIndexRefresh: only novel incoming hashes append; refreshed set = ever-seen set") {
    import org.apache.spark.sql.functions._
    // recover the 'inc:' membership (as the spanScrubIngest spec)
    val member = spark.range(30).select(col("id"),
      (graft.operators.Relational.scrambleMod(graft.functions.TextHash
        .polyHash(concat(lit("inc:"), col("id").cast("string"))))
        % 5 === 0L).as("inc")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val incIds = member.filter(_._2).keys.toSeq.sorted
    val exId = member.filter(!_._2).keys.min
    val shared = (1 to 8).map(i => s"sh$i").mkString(" ") // 1 span, dup
    val texts = (0L until 30L).map { id =>
      if (id == exId) shared // existing owns the shared span
      else if (id == incIds.head) shared // incoming dup: NOT novel
      else if (id == incIds(1)) (1 to 8).map(i => s"nv$i").mkString(" ") // novel
      else s"f${id}a f${id}b f${id}c" // < w tokens: no spans
    }
    withDocsDir(texts) { dir =>
      val rows = Dedup.spanIndexRefresh(spark, dir).collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_existing"),
          r.getAs[Long]("n_new"), r.getAs[Long]("n_refreshed")))
      // exactly one existing hash (the shared span) and one novel one
      assert(rows.map(_._2).sum === 1L, s"n_existing: $rows")
      assert(rows.map(_._3).sum === 1L, s"n_new: $rows")
      assert(rows.map(_._4).sum === 2L, s"n_refreshed: $rows")
      rows.foreach { case (_, ex, nw, rf) => assert(rf === ex + nw) }
      // a second day with nothing new appends nothing: refresh again
      // over the same corpus — the incoming dup stays index-absent
      val again = Dedup.spanIndexRefresh(spark, dir).collect()
        .map(r => (r.getAs[Long]("n_existing"), r.getAs[Long]("n_new")))
      assert(again.map(_._2).sum === 1L) // fresh temp index per call
    }
  }

  test("span index: a span-free corpus writes an EMPTY index that reads back, not a throw") {
    // every doc shorter than w tokens -> zero spans -> writeSpanIndex
    // lays down no part files; the explicit-schema reader must
    // degrade to an empty relation (matching the oracle) instead of
    // failing parquet schema inference
    withDocsDir(Seq("a b c", "d e f", "g h i", "j k l", "m n o")) { dir =>
      val rt = Dedup.spanIndexRoundTrip(spark, dir).collect()
      assert(rt.forall(r => r.getAs[Long]("n_dup_spans") === 0L &&
        r.getAs[Long]("n_removed_tokens") === 0L))
      assert(Dedup.spanIndexRefresh(spark, dir).collect().isEmpty)
    }
  }

  test("spanScrubDayTwo: day-1 spans cut day-2 copies via the refreshed index") {
    import org.apache.spark.sql.functions._
    // recover the three-generation membership (m = scramble mod 5)
    val gens = spark.range(40).select(col("id"),
      (graft.operators.Relational.scrambleMod(graft.functions.TextHash
        .polyHash(concat(lit("inc:"), col("id").cast("string"))))
        % 5).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d1 = gens.filter(_._2 == 0L).keys.min  // a day-1 doc
    val d2s = gens.filter(_._2 == 1L).keys.toSeq.sorted
    val (d2a, d2b) = (d2s.head, d2s(1))
    val exId = gens.filter(kv => kv._2 != 0L && kv._2 != 1L).keys.min
    val day1Span = (1 to 8).map(i => s"da$i").mkString(" ")
    val exSpan = (1 to 8).map(i => s"ex$i").mkString(" ")
    val texts = (0L until 40L).map { id =>
      if (id == d1) day1Span                   // day 1 introduces it
      else if (id == exId) exSpan              // existing owns this one
      else if (id == d2a) s"qq rr $day1Span"   // day 2 repeats day 1's
      else if (id == d2b) s"$exSpan tt uu"     // day 2 repeats existing's
      else s"g${id}a g${id}b g${id}c"          // < w tokens: span-free
    }
    withDocsDir(texts) { dir =>
      val out = Dedup.spanScrubDayTwo(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_removed_tokens"),
            r.getAs[String]("cleaned_text")))).toMap
      // only day-2 docs appear
      assert(out.keySet === gens.filter(_._2 == 1L).keys.toSet)
      // CROSS-GENERATION memory: the day-1 span is in the refreshed
      // index, so day 2's copy is cut even though no q278-style
      // within-batch duplicate exists
      assert(out(d2a) === ((1L, 8L, "qq rr")))
      // and spans owned by the original existing corpus still cut
      assert(out(d2b) === ((1L, 8L, "tt uu")))
      // untouched day-2 docs pass through
      d2s.drop(2).foreach(id =>
        assert(out(id) === ((0L, 0L, s"g${id}a g${id}b g${id}c"))))
    }
  }

  test("spanScrub round-trip: the cleaned corpus has zero duplicated spans left") {
    import spark.implicits._
    val doc24 = ((1 to 8) ++ (1 to 8) ++ (1 to 8)).map(i => s"s$i").mkString(" ")
    withDocsDir(Seq(
      "a b c d e f g h x1 x2",
      "p q a b c d e f g h",
      doc24)) { dir =>
      val cleaned = Dedup.spanScrub(spark, dir)
        .select(col("doc_id"), col("cleaned_text").as("text"),
          length(col("cleaned_text")).cast("long").as("n_chars"))
      val dir2 = java.nio.file.Files.createTempDirectory("scrub-rt").toString
      try {
        cleaned.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
        val second = scrubRows(dir2)
        assert(second.values.forall(_._3 === 0L),
          s"re-scrubbing the cleaned corpus must remove nothing: $second")
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir2))
    }
  }

  private def clusterRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("cluster_id"))).toSet

  test("q309: incremental day-2 clustering == full q38 recompute bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val full = clusterRows(Dedup.dupClusters(spark, dir))
    val incr = clusterRows(Dedup.incrementalClusters(spark, dir))
    assert(full.nonEmpty)
    assert(incr === full)
  }

  test("q310: signature-index refresh audit — per-shard identity; totals match the shingle-bearing strata") {
    val dir = "/root/testdata/sf0.001"
    val audit = Dedup.lshSigRefresh(spark, dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_existing"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_total")))
    assert(audit.nonEmpty)
    audit.foreach { case (sh, ex, nw, tot) =>
      assert(ex + nw === tot, s"shard $sh: $ex + $nw != $tot")
    }
    // conservation: a doc carries a signature iff it has >= 3 tokens
    val m = spark.read.parquet(s"$dir/documents.parquet")
      .select(
        (size(split(trim(lower(col("text"))), "\\s+")) >= 3).as("sig"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash
          .polyHash(concat(lit("inc:"), col("doc_id").cast("string"))))
          % 5 === 0L).as("inc"))
      .filter(col("sig")).groupBy(col("inc")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(audit.map(_._2).sum === m.getOrElse(false, 0L))
    assert(audit.map(_._3).sum === m.getOrElse(true, 0L))
  }

  test("q313: clustering over the COMPACTED signature index == full q38 recompute; compaction is layout-only") {
    val dir = "/root/testdata/sf0.001"
    val full = clusterRows(Dedup.dupClusters(spark, dir))
    val (compacted, result) =
      Dedup.compactSigIndex(spark, dir, 0.5, 5, 8)
    assert(full.nonEmpty)
    assert(clusterRows(result) === full)
    // OPTIMIZE contract: one doc_id-sorted file per shard directory
    val shards = new java.io.File(compacted).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shards.nonEmpty, s"no shard dirs under $compacted")
    shards.foreach { sd =>
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"shard ${sd.getName} has ${parts.length} files after compaction")
    }
  }

  test("q314: signature purge audit — per-shard identity; totals match the purge scramble over shingle-bearing docs") {
    val dir = "/root/testdata/sf0.001"
    val audit = Dedup.lshSigPurge(spark, dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_purged"), r.getAs[Long]("n_after")))
    assert(audit.nonEmpty)
    // a REAL identity since round 15: n_purged is measured from the
    // base files ∩ purge set, not derived as b - a, so a writer that
    // leaked or over-purged rows breaks this (round-14 ADVICE)
    audit.foreach { case (sh, b, p, a) =>
      assert(b === p + a, s"shard $sh: $b != $p + $a")
    }
    // conservation against the raw corpus: a doc carries a signature
    // iff it has >= 3 tokens; purge membership is the 'purge:' scramble
    val m = spark.read.parquet(s"$dir/documents.parquet")
      .select(
        (size(split(trim(lower(col("text"))), "\\s+")) >= 3).as("sig"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash
          .polyHash(concat(lit("purge:"), col("doc_id").cast("string"))))
          % 5 === 0L).as("purged"))
      .filter(col("sig")).groupBy(col("purged")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(audit.map(_._3).sum === m.getOrElse(true, 0L),
      "purged total must equal the scramble-selected signature count")
    assert(audit.map(_._4).sum === m.getOrElse(false, 0L),
      "surviving total must equal the surviving signature count")
  }

  test("q315: clustering through the manifest-resolved signature index == full q38 recompute") {
    val dir = "/root/testdata/sf0.001"
    val full = clusterRows(Dedup.dupClusters(spark, dir))
    val viaMf = clusterRows(Dedup.incrementalClustersViaManifest(spark, dir))
    assert(full.nonEmpty)
    assert(viaMf === full)
  }

  test("q320: time travel scrubs against yesterday's index — day-1 novel spans survive that q288 cuts") {
    val dir = "/root/testdata/sf0.001"
    def dups(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_dup_spans")).toMap
    val tt = dups(Dedup.spanScrubTimeTravel(spark, dir))
    val latest = dups(Dedup.spanScrubDayTwo(spark, dir))
    assert(tt.keySet === latest.keySet,
      "both reads scrub the same day-2 shard")
    // the snapshot index is a SUBSET of the refreshed one, so time
    // travel can only cut fewer (or equal) occurrences per doc...
    tt.foreach { case (id, n) =>
      assert(n <= latest(id), s"doc $id: snapshot cut MORE than latest")
    }
    // ...and the difference must be VISIBLE: the sf0.001 fixture
    // carries day-2 repeats of day-1-novel spans (deterministic
    // scramble split), which the latest-manifest read cuts and the
    // day-1 snapshot must NOT — equality here would mean resolveAt
    // leaked the delta generation
    assert(tt.values.sum < latest.values.sum,
      "time-travel scrub identical to the latest-manifest scrub — " +
        "the snapshot read did not exclude the day-1 delta")
  }

  test("q324: clustering under resolveAt(base ∪ delta) == full q38 recompute — the pre-OPTIMIZE snapshot lost nothing") {
    val dir = "/root/testdata/sf0.001"
    val full = clusterRows(Dedup.dupClusters(spark, dir))
    val viaTt = clusterRows(Dedup.incrementalClustersTimeTravel(spark, dir))
    assert(full.nonEmpty)
    // the compacted switch is layout-only, so yesterday's snapshot
    // must reproduce today's clusters exactly; the retired-generation-
    // absent half of the contract is PlanQualitySpec's q324 pin
    assert(viaTt === full)
  }

  test("q326: post-soak clustering == full q38 recompute; exactly 4 generations GC'd and gone; kept window intact") {
    val dir = "/root/testdata/sf0.001"
    val full = clusterRows(Dedup.dupClusters(spark, dir))
    val (root, deleted, result) = Dedup.sigSoakParts(spark, dir, 0.5, 5, 8)
    assert(full.nonEmpty)
    // the three daily slices union to exactly q309's existing set, and
    // GC deleted nothing the final read needed
    assert(clusterRows(result) === full)
    assert(deleted.size === 4, s"deleted: $deleted")
    Seq("lsh_sig_soakbase", "lsh_sig_soakd0", "lsh_sig_soakc0",
        "lsh_sig_soakd1")
      .foreach(tag => assert(deleted.exists(_.contains(tag)),
        s"$tag not GC'd: $deleted"))
    deleted.foreach(g => assert(!new java.io.File(g).exists,
      s"GC'd generation still on disk: $g"))
    val live = graft.operators.IndexManifest.resolve(spark, root)
    assert(live.size === 1 && live.head.contains("lsh_sig_soakc2"),
      s"final resolve must name the day-3 compaction alone: $live")
    graft.operators.IndexManifest.committedIds(spark, root).foreach { id =>
      graft.operators.IndexManifest.resolveAt(spark, root, id).foreach(g =>
        assert(new java.io.File(g).isDirectory,
          s"kept snapshot m_$id names a missing generation: $g"))
    }
  }

  test("q309 merge step: a bridge node MERGES two day-1 components; fresh-only pairs form new clusters; untouched components keep their labels") {
    import spark.implicits._
    // day 1: components {0,1}→0, {2,3}→2, {7,9}→7
    val labels1 = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L),
      (7L, 7L), (9L, 7L)).toDF("doc_id", "cluster_id")
    // day 2: incoming 15 bridges members of BOTH components (via a
    // non-label member on one side — contraction must still merge),
    // incoming 20/21 pair only with each other
    val newPairs = Seq((1L, 15L), (15L, 3L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.mergeIncremental(newPairs, labels1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (15L, 0L), // merged to 0
      (20L, 20L), (21L, 20L),                            // fresh cluster
      (7L, 7L), (9L, 7L)))                               // untouched
  }
}
