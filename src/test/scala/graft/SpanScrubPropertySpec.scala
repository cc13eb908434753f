package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Randomized cross-check of the duplicated-span removal family
  * (q278 spanScrub, q282 spanScrubIngest, q285 spanIndexRoundTrip)
  * against a direct sequential reference: span keys here are the
  * w-token CONTENT (not hashes), so the check also stands witness
  * that the hashed relational pipeline implements the content-level
  * semantics (a hash collision or a window off-by-one would diverge).
  * Corpora are seeded and built from a small phrase pool so cross-doc
  * and within-doc span repetitions occur by construction.
  */
class SpanScrubPropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = 8

  private def toks(t: String): Vector[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector

  /** Sequential q278 semantics: global (doc_id, pos)-first occurrence
    * of every duplicated w-token span survives; every other occurrence
    * removes tokens [pos, pos+w-1]; kept = tokens covered by no
    * removal interval.
    */
  private def refScrub(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, String)] = {
    val tk = docs.map { case (id, t) => id -> toks(t) }.toMap
    val occ = for {
      (id, _) <- docs
      ts = tk(id)
      p <- 1 to math.max(0, ts.length - W + 1)
    } yield (id, p.toLong, ts.slice(p - 1, p - 1 + W))
    val removed = occ.groupBy(_._3).values.flatMap { os =>
      if (os.size >= 2) os.sortBy(o => (o._1, o._2)).tail.map(o => (o._1, o._2))
      else Nil
    }.toSet
    finish(docs, tk, removed)
  }

  /** Sequential q282 semantics over an existing/incoming split: an
    * incoming occurrence is cut when its span content exists in the
    * existing corpus, or by the within-batch first-occurrence rule.
    */
  private def refIngest(existing: Seq[(Long, String)],
                        incoming: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, String)] = {
    def spans(docs: Seq[(Long, String)]) = for {
      (id, t) <- docs
      ts = toks(t)
      p <- 1 to math.max(0, ts.length - W + 1)
    } yield (id, p.toLong, ts.slice(p - 1, p - 1 + W))
    val index = spans(existing).map(_._3).toSet
    val inc = spans(incoming)
    val inIdx = inc.filter(o => index.contains(o._3)).map(o => (o._1, o._2))
    val dupWithin = inc.filterNot(o => index.contains(o._3))
      .groupBy(_._3).values.flatMap { os =>
        if (os.size >= 2) os.sortBy(o => (o._1, o._2)).tail.map(o => (o._1, o._2))
        else Nil
      }
    val tk = incoming.map { case (id, t) => id -> toks(t) }.toMap
    finish(incoming, tk, (inIdx ++ dupWithin).toSet)
  }

  private def finish(docs: Seq[(Long, String)],
                     tk: Map[Long, Vector[String]],
                     removed: Set[(Long, Long)])
      : Map[Long, (Long, Long, Long, String)] =
    docs.map { case (id, _) =>
      val ts = tk(id)
      val rms = removed.collect { case (d, p) if d == id => p }
      val kept = ts.zipWithIndex.collect {
        case (t, i0) if !rms.exists(r => r <= i0 + 1 && i0 + 1 <= r + W - 1) => t
      }
      id -> ((ts.length.toLong, rms.size.toLong,
        (ts.length - kept.length).toLong, kept.mkString(" ")))
    }.toMap

  /** Seeded corpus with guaranteed span repeats: each doc concatenates
    * 2–4 segments, each either a phrase from a 3-phrase pool (8 tokens
    * — exactly one span per occurrence) or 8 fresh random tokens.
    */
  private def randCorpus(seed: Long, nDocs: Int): Seq[String] = {
    val rng = new java.util.Random(seed)
    val pool = (1 to 3).map(p => (1 to W).map(i => s"p${p}w$i").mkString(" "))
    var fresh = 0
    (1 to nDocs).map { _ =>
      (1 to (2 + rng.nextInt(3))).map { _ =>
        if (rng.nextBoolean()) pool(rng.nextInt(pool.size))
        else { fresh += 1; (1 to W).map(i => s"f${fresh}x$i").mkString(" ") }
      }.mkString(" ")
    }
  }

  private def withDocsDir(texts: Seq[String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("spanprop").toString
    try {
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  private def collectRows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, String)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
        r.getAs[Long]("n_removed_tokens"),
        r.getAs[String]("cleaned_text")))).toMap

  test("spanScrub == sequential reference on seeded random corpora") {
    for (seed <- Seq(13L, 47L, 907L)) {
      val docs = randCorpus(seed, nDocs = 6)
      val want = refScrub(docs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      withDocsDir(docs) { dir =>
        assert(collectRows(Dedup.spanScrub(spark, dir)) === want,
          s"seed=$seed")
      }
    }
  }

  test("q289: compaction is content-neutral — compacted scrub == q288 scrub") {
    // refresh → compact → scrub must equal refresh → scrub bit-for-bit
    // (compaction changes layout, never content); run on the real
    // fixture corpus so the three-generation split is non-degenerate
    val dir = "/root/testdata/sf0.001"
    val direct = collectRows(Dedup.spanScrubDayTwo(spark, dir))
    val compacted = collectRows(Dedup.spanScrubCompacted(spark, dir))
    assert(direct.nonEmpty, "day-2 slice must carry documents")
    assert(compacted === direct)
  }

  test("q303: manifest-resolved scrub == q288 scrub (the switch changes dirs, never content)") {
    val dir = "/root/testdata/sf0.001"
    val direct = collectRows(Dedup.spanScrubDayTwo(spark, dir))
    val viaManifest = collectRows(Dedup.spanScrubViaManifest(spark, dir))
    assert(direct.nonEmpty, "day-2 slice must carry documents")
    assert(viaManifest === direct)
  }

  test("q323: orphan sweep reclaims the stray generation and crashed manifest; scrub == q288; committed state intact") {
    val dir = "/root/testdata/sf0.001"
    val direct = collectRows(Dedup.spanScrubDayTwo(spark, dir))
    val (root, swept, gens, scrub) =
      Dedup.orphanSweepParts(spark, dir, 8, 5, 8)
    assert(direct.nonEmpty, "day-2 slice must carry documents")
    // content half: the sweep deleted nothing a committed manifest
    // references — a swept live generation would un-cut day-2 spans
    assert(collectRows(scrub) === direct)
    // disk half: both planted crash artifacts are really gone...
    assert(swept === Seq(s"$root/gens/stray_compact"),
      "the sweep must reclaim exactly the never-committed generation")
    assert(!new java.io.File(s"$root/gens/stray_compact").exists)
    assert(!new java.io.File(s"$root/m_99").exists,
      "the crashed manifest dir must be reclaimed too")
    // ...and the committed generations and snapshots are untouched
    gens.foreach(g => assert(new java.io.File(g).isDirectory,
      s"sweep deleted the LIVE generation $g"))
    assert(graft.operators.IndexManifest.resolve(spark, root) === gens)
    val ids = graft.operators.IndexManifest.committedIds(spark, root)
    assert(graft.operators.IndexManifest
      .resolveAt(spark, root, ids.head) === Seq(gens.head),
      "time travel to the day-1 snapshot must survive the sweep")
  }

  test("q325: three-day span soak — final scrub == q288; exactly 4 generations GC'd and gone; kept window intact") {
    val dir = "/root/testdata/sf0.001"
    val direct = collectRows(Dedup.spanScrubDayTwo(spark, dir))
    val (root, deleted, scrub) = Dedup.spanSoakParts(spark, dir, 8, 5, 8)
    assert(direct.nonEmpty, "day-2 slice must carry documents")
    // content: the three daily deltas union to exactly q288's delta,
    // and GC deleted nothing the final read needed
    assert(collectRows(scrub) === direct)
    // GC reclaimed exactly: base, day-0 delta, day-0 compaction,
    // day-1 delta (keepLast = 2 walks the window forward each day)
    assert(deleted.size === 4, s"deleted: $deleted")
    Seq("span_soak_base", "span_soak_d0", "span_soak_c0", "span_soak_d1")
      .foreach(tag => assert(deleted.exists(_.contains(tag)),
        s"$tag not GC'd: $deleted"))
    deleted.foreach(g => assert(!new java.io.File(g).exists,
      s"GC'd generation still on disk: $g"))
    // the kept window is intact on disk and resolves
    val live = graft.operators.IndexManifest.resolve(spark, root)
    assert(live.size === 1 && live.head.contains("span_soak_c2"),
      s"final resolve must name the day-2 compaction alone: $live")
    graft.operators.IndexManifest.committedIds(spark, root).foreach { id =>
      graft.operators.IndexManifest.resolveAt(spark, root, id).foreach(g =>
        assert(new java.io.File(g).isDirectory,
          s"kept snapshot m_$id names a missing generation: $g"))
    }
  }

  test("q331: the triggered soak compacts exactly once — no-op days rewrite nothing, content == q288") {
    val dir = "/root/testdata/sf0.001"
    val direct = collectRows(Dedup.spanScrubDayTwo(spark, dir))
    val (root, ran, live, scrub) = Dedup.spanTrigParts(spark, dir, 8, 5, 8,
      maxGens = 2)
    // cadence: day 0 ends at base+d0 (2 ≤ maxGens, pure read), day 1
    // reaches 3 and folds, day 2 ends at c1+d2 (no-op again)
    assert(ran === Seq(false, true, false),
      s"expected exactly the day-1 compaction, got $ran")
    assert(live.size === 2 && live.head.contains("span_trig_c1") &&
      live(1).contains("span_trig_d2"),
      s"final live set must be the day-1 fold plus the day-2 delta: $live")
    assert(graft.operators.IndexManifest.resolve(spark, root) === live)
    // the no-op days really wrote nothing: the only compaction dir on
    // disk under this invocation's roots is the day-1 fold
    val cDirs = live ++ graft.operators.IndexManifest
      .committedGens(spark, root)
    assert(cDirs.filter(_.contains("span_trig_c")).toSet.size === 1,
      s"a no-op day materialized a compaction: $cDirs")
    // content: compaction CADENCE never changes what the index holds —
    // the final scrub equals q288's (q325's shared-oracle argument)
    assert(collectRows(scrub) === direct)
  }

  /** Sequential q290 semantics at span-CONTENT level: n_before = all
    * distinct spans, a span is purged iff NO surviving doc contains
    * it. Shard assignment is hash arithmetic the content-level
    * reference cannot see, so the check compares per-shard-summed
    * totals (the DuckDB oracle pins the per-shard split at hash
    * level).
    */
  test("q290: a span shared with a surviving doc stays; exclusive spans leave") {
    val docs = randCorpus(907L, nDocs = 12)
    val member = spark.range(docs.size).select(col("id"),
      (graft.operators.Relational.scrambleMod(graft.functions.TextHash
        .polyHash(concat(lit("purge:"), col("id").cast("string"))))
        % 5 === 0L).as("purged")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(member.values.exists(identity) && member.values.exists(!_),
      "fixture must carry both purged and surviving docs")
    def spans(ds: Seq[(Long, String)]): Set[Vector[String]] = (for {
      (id, t) <- ds
      ts = toks(t)
      p <- 1 to math.max(0, ts.length - W + 1)
    } yield ts.slice(p - 1, p - 1 + W)).toSet
    val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val all = spans(ids)
    val surviving = spans(ids.filterNot(d => member(d._1)))
    val exclusive = all -- surviving
    // the seeded corpus guarantees both cases exist: pool phrases are
    // shared across the purge boundary, fresh segments are exclusive
    assert(exclusive.nonEmpty && (all & surviving).nonEmpty)
    val dir = dirFor(docs)
    val rows = try {
      Dedup.spanIndexPurge(spark, dir)
        .collect().map(r => (r.getAs[Long]("n_before"),
          r.getAs[Long]("n_purged"), r.getAs[Long]("n_after")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
    rows.foreach { case (b, p, a) =>
      assert(b === p + a, "per-shard accounting must balance") }
    assert(rows.map(_._1).sum === all.size.toLong)
    assert(rows.map(_._2).sum === exclusive.size.toLong)
    assert(rows.map(_._3).sum === surviving.size.toLong)
  }

  /** withDocsDir variant that hands the dir back (the purge test
    * deletes it itself after the collect — the audit plan reads
    * scratch generations, not the corpus, but construction's eager
    * base-index write needs the files).
    */
  private def dirFor(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("spanprop").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("spanScrubIngest and spanIndexRoundTrip == sequential ingest reference") {
    for (seed <- Seq(67L, 811L)) {
      val docs = randCorpus(seed, nDocs = 10)
      // recover the 'inc:' shard membership the operators will apply
      val member = spark.range(docs.size).select(col("id"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash
          .polyHash(concat(lit("inc:"), col("id").cast("string"))))
          % 5 === 0L).as("inc")).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val want = refIngest(ids.filterNot(d => member(d._1)),
        ids.filter(d => member(d._1)))
      withDocsDir(docs) { dir =>
        assert(collectRows(Dedup.spanScrubIngest(spark, dir)) === want,
          s"seed=$seed inline")
        assert(collectRows(Dedup.spanIndexRoundTrip(spark, dir)) === want,
          s"seed=$seed via persisted index")
      }
    }
  }
}
