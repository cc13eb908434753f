package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{KmvSketch, TextHash}

/** Training-data pipeline operators beyond the per-document text
  * family: corpus statistics (sketched distinct counts), deterministic
  * dataset splits, PII-style masking, and domain-mixture weighting.
  * All arithmetic is oracle-replicable (OracleSql q26–q29).
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Q26 — KMV distinct-token sketch per `source`: bounded-state
    * mergeable distinct estimate via [[KmvSketch]]. The typed
    * aggregation runs partially on the map side (k longs per
    * partition×source through the exchange), which is the whole point
    * at 100 TB — `count(DISTINCT token)` would shuffle every token.
    */
  def kmvDistinctTokens(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import s.implicits._
    val sketch = new KmvSketch(k, TextHash.P)
    docs(s, dir)
      .select(col("source"), explode(TextHash.tokens(col("text"))).as("token"))
      .select(col("source"), TextHash.polyHash(col("token")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(sketch.toColumn)
      .map { case (src, o) => (src, o.n_kept, o.kth_min, o.est_distinct) }
      .toDF("source", "n_kept", "kth_min", "est_distinct")
  }

  /** Q158 — DSIR-style importance weights for data selection (Xie et
    * al., NeurIPS 2023: select pretraining data whose hashed n-gram
    * feature distribution matches a target domain). Features are
    * 2-token span hashes folded into a FIXED bucket space (the paper's
    * hashed feature trick — `buckets` stays ~10⁴ no matter the corpus,
    * which is what makes the weight table broadcastable at 100 TB);
    * the target distribution comes from the `targetSource` slice, the
    * reference distribution from the whole corpus. A document's score
    * is Σ over its feature OCCURRENCES of
    * `bucket2p(c_target(f)) − bucket2p(c_corpus(f))` where
    * `bucket2p(c) = ⌊log2 c⌋ + 1 = length(bin(c))` and absent target
    * features contribute 0 — the repo's integer-log2 discipline
    * standing in for the paper's log-likelihood ratio (same ordering
    * family, no ln(), bitwise-exact oracle parity). High scores ≈
    * "looks like the target domain"; downstream selection takes the
    * top slice per the Q36/Q145 sampling machinery.
    *
    * Scale shape: feature extraction is the native one-pass span-hash
    * expression (no shuffle); both count tables aggregate into the
    * BOUNDED bucket space (map-side combined, ≤ `buckets` rows out);
    * the weight table is a broadcast join; the only corpus-keyed
    * shuffle is the final per-doc sum. The corpus is scanned twice
    * (count pass, score pass) — the standard two-pass trade at scale,
    * where caching the exploded features would cost more than the
    * rescan.
    */
  def dsirWeights(s: SparkSession, dir: String,
                  targetSource: String = "src0",
                  buckets: Int = 8192): DataFrame = {
    val occ = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(TextHash.spanHashes(col("text"), 2)).as("h"))
      .select(col("doc_id"), col("source"),
        (col("h") % buckets.toLong).as("f"))
    val cAll = occ.groupBy(col("f")).agg(count(lit(1)).as("c_all"))
    val cTgt = occ.filter(col("source") === targetSource)
      .groupBy(col("f")).agg(count(lit(1)).as("c_tgt"))
    val wt = cAll.join(cTgt, Seq("f"), "left")
      .select(col("f"),
        (coalesce(length(bin(col("c_tgt"))), lit(0)).cast("long") -
          length(bin(col("c_all"))).cast("long")).as("w"))
    occ.join(broadcast(wt), Seq("f"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("dsir_score"))
  }

  /** Q145 — deterministic PRIORITY SAMPLING (Duffield–Lund–Thorup,
    * JACM'07) of documents weighted by length: priority = w / u with
    * w = n_chars and u a deterministic uniform in (0,1] derived from
    * the same polyHash stream as the Q27 split (u = (h+1)/P). The k
    * highest-priority docs are the sample; each kept doc's
    * Horvitz-Thompson weight estimate is max(w, τ) where τ is the
    * (k+1)-th priority — subset sums of `est_w` are unbiased
    * estimators of the corresponding n_chars totals, the property a
    * weighted-downsampling pipeline needs for calibrated corpus
    * mixing (vs Q36's heuristic quality downsampling and Q41's
    * UNweighted reservoir).
    *
    * Float discipline: u and priority are each ONE IEEE division of
    * integer-derived values (exactly-rounded, engine-identical), the
    * comparison sort is on (priority DESC, doc_id) so even an exact
    * priority tie is deterministic, and est_w = greatest(w, τ) adds
    * no arithmetic.
    *
    * Scale shape: priorities are a narrow projection at the scan; the
    * global top-(k+1) is TakeOrdered (per-partition partial top-k,
    * then a k+1-row merge on the driver — never a full sort); τ and
    * the window rank run on the k+1-row result, which is broadcast-
    * sized by construction.
    */
  def prioritySample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val pri = docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        ((TextHash.polyHash(col("doc_id").cast("string")) + lit(1L))
          .cast("double") / lit(TextHash.P.toDouble)).as("u"))
      .withColumn("priority", col("n_chars").cast("double") / col("u"))
    val top = pri.orderBy(col("priority").desc, col("doc_id")).limit(k + 1)
    val w = Window.orderBy(col("priority").desc, col("doc_id"))
    val ranked = top.withColumn("rnk", row_number().over(w))
    val tau = ranked.filter(col("rnk") === k + 1)
      .select(col("priority").as("tau"))
    ranked.filter(col("rnk") <= k).crossJoin(tau)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("priority"),
        greatest(col("n_chars").cast("double"), col("tau")).as("est_w"))
  }

  /** Q165 — token-budget water-filling: allocate a corpus-wide token
    * budget (2/5 of total tokens here) across sources, capping each
    * source at its own supply and redistributing the excess to the
    * still-uncapped sources — the allocator behind "train on T tokens
    * with per-source ceilings" data-mixing plans. Three unrolled
    * redistribution rounds (the q143/q163 fixed-round contract: caps
    * are monotone, so once no new source caps, later rounds are
    * no-ops; 3 rounds cover the fixture's cap chain to fixpoint).
    *
    * Scale shape: the per-source token table is a GROUPED AGGREGATE
    * (source is a low-cardinality dimension), so every round's budget
    * recomputation is a one-row broadcast crossJoin — never a window
    * over ungrouped data, never a driver collect. All shares stay in
    * double with pinned operation order; cap sums stay BIGINT-exact.
    */
  def budgetWaterfill(s: SparkSession, dir: String): DataFrame = {
    val a = docs(s, dir)
      .select(col("source"),
        size(TextHash.tokens(col("text"))).cast("long").as("ntk"))
      .groupBy(col("source")).agg(sum(col("ntk")).as("n_tokens"))
    val t0 = a.agg(sum(col("n_tokens")).as("total"),
        count(lit(1)).as("n1"))
      .withColumn("budget", col("total").cast("double") * lit(2) / lit(5))
      .withColumn("share1", col("budget") / col("n1"))
    val b1 = a.crossJoin(broadcast(t0))
      .withColumn("c1", col("n_tokens") <= col("share1"))
    val g2 = b1.agg(
      sum(when(col("c1"), col("n_tokens")).otherwise(0L)).as("cap1"),
      sum(col("c1").cast("long")).as("ncap1"))
    val b2 = b1.crossJoin(broadcast(g2))
      .withColumn("share2",
        (col("budget") - col("cap1")) / nullif(col("n1") - col("ncap1"), lit(0L)))
      .withColumn("c2",
        !col("c1") && coalesce(col("n_tokens") <= col("share2"), lit(false)))
    val g3 = b2.agg(
      sum(when(col("c1") || col("c2"), col("n_tokens")).otherwise(0L)).as("cap2"),
      sum((col("c1") || col("c2")).cast("long")).as("ncap2"))
    b2.crossJoin(broadcast(g3))
      .withColumn("share3",
        (col("budget") - col("cap2")) / nullif(col("n1") - col("ncap2"), lit(0L)))
      .withColumn("c3",
        !col("c1") && !col("c2") &&
          coalesce(col("n_tokens") <= col("share3"), lit(false)))
      .select(col("source"), col("n_tokens"),
        (col("c1") || col("c2") || col("c3")).as("capped"),
        when(col("c1") || col("c2") || col("c3"),
          col("n_tokens").cast("double"))
          .otherwise(col("share3")).as("alloc"))
  }

  /** Q151 — PER-STRATUM priority sampling: Q145's estimator run
    * independently inside every `source` stratum (k docs and a
    * per-stratum threshold τ each) — the proportional-by-design
    * corpus-mixing sampler: subset sums of est_w within a stratum
    * estimate that stratum's n_chars total, so downstream mixing
    * weights stay calibrated per source.
    *
    * Scale shape: one window rank per stratum over the priority
    * projection (bounded per-source volume; a hot stratum upgrades to
    * the Q46 two-level bucketed rank with the same semantics), the
    * k+1-rank τ row joins back on the stratum key. Strata with ≤ k
    * docs keep everything with est_w = w exactly (their HT inclusion
    * probability is 1 — the estimator stays unbiased).
    */
  def stratifiedPrioritySample(s: SparkSession, dir: String,
                               k: Int = 10): DataFrame = {
    val pri = docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        ((TextHash.polyHash(col("doc_id").cast("string")) + lit(1L))
          .cast("double") / lit(TextHash.P.toDouble)).as("u"))
      .withColumn("priority", col("n_chars").cast("double") / col("u"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    val ranked = pri.withColumn("rnk", row_number().over(w))
    val tau = ranked.filter(col("rnk") === k + 1)
      .select(col("source"), col("priority").as("tau"))
    ranked.filter(col("rnk") <= k)
      .join(broadcast(tau), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority"),
        when(col("tau").isNull, col("n_chars").cast("double"))
          .otherwise(greatest(col("n_chars").cast("double"), col("tau")))
          .as("est_w"))
  }

  /** Q27 — deterministic train/val/test split: bucket =
    * polyHash(doc_id as string) mod 100, thresholds 90/95. A pure
    * projection (no RNG, no shuffle before the roll-up aggregate), so
    * the split is stable across runs, partitionings, and engines —
    * the property a reproducible training pipeline actually needs.
    * The string-hash avoids integer-multiply overflow under ANSI mode
    * for arbitrarily large ids.
    */
  def hashSplit(s: SparkSession, dir: String,
                trainPct: Int = 90, valPct: Int = 5): DataFrame =
    docs(s, dir)
      .withColumn("bucket",
        pmod(TextHash.polyHash(col("doc_id").cast("string")), lit(100L)))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  /** Q46 — EXACT stratified split: within every `lang` stratum the
    * docs are ranked by (polyHash(doc_id), doc_id) and the first
    * ⌊trainPct%⌋ go to train, the next ⌊valPct%⌋ to val, the rest to
    * test — exact per-stratum proportions (vs q27's hash-bucket split,
    * which is only proportional in expectation).
    *
    * An exact split needs a per-stratum total order, and the naive
    * `row_number() OVER (PARTITION BY lang)` puts an entire stratum in
    * ONE task — a single "en" stratum at 100 TB would serialize. The
    * skew-safe shape used here is the same two-level prefix sum as
    * [[packSequences]], but bucketed on the HASH RANGE (bucket = hh
    * div (P/B), monotone in hh, so bucket boundaries respect the sort
    * order): per-(lang, bucket) counts roll up to broadcastable start
    * offsets, ranks are row_numbers within a (lang, bucket) cell, and
    * the global rank is offset + local rank. Parallelism is langs×B
    * regardless of stratum skew; B grows with the corpus. The split
    * thresholds compare in pure integer cross-multiplication
    * (100·rank ≤ pct·n), so assignment is engine-exact.
    */
  def stratifiedSplit(s: SparkSession, dir: String,
                      trainPct: Int = 80, valPct: Int = 10,
                      nBuckets: Int = 64): DataFrame = {
    val width = TextHash.P / nBuckets + 1L
    val d = docs(s, dir).select(col("doc_id"), col("lang"))
      .withColumn("hh", TextHash.polyHash(col("doc_id").cast("string")))
      .withColumn("bucket", expr(s"hh div $width"))
    val wCells = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = d.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))
    val offs = cells.select(col("lang"), col("bucket"),
      coalesce(sum(col("cell_n")).over(wCells), lit(0L)).as("cell_start"),
      sum(col("cell_n")).over(Window.partitionBy(col("lang"))).as("n"))
    val wLocal = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("hh"), col("doc_id"))
    d.join(broadcast(offs), Seq("lang", "bucket"))
      .withColumn("rnk", col("cell_start") + row_number().over(wLocal))
      .select(col("doc_id"), col("lang"),
        when(col("rnk") * 100 <= col("n") * trainPct, "train")
          .when(col("rnk") * 100 <= col("n") * (trainPct + valPct), "val")
          .otherwise("test").as("split"))
  }

  /** Q52 — the end-to-end curation manifest: the composition a real
    * training-data pipeline runs as one job. A document survives iff it
    * is (1) the canonical copy under exact dedup (q15's keep-first
    * rule), (2) above the q18 quality threshold, (3) not benchmark-
    * contaminated (q35; the benchmark slice itself is excluded as eval
    * data), and every survivor carries its q46 stratified split.
    *
    * Each input is an already-aggregated per-doc_id frame, so the
    * composition is three doc_id-keyed equi-joins over progressively
    * shrinking sets — Catalyst reuses one partitioning across them.
    * Demonstrates that the engine's curation stages compose lazily
    * into ONE plan (single action, no intermediate materialization),
    * which is the operational contract at 100 TB.
    */
  def curate(s: SparkSession, dir: String,
             minQuality: Double = 0.55): DataFrame = {
    val keep = TextAnalysis.dedupExact(s, dir).select("doc_id")
    val qual = TextAnalysis.qualityScore(s, dir)
      .select(col("doc_id"), col("quality_score"))
      .filter(col("quality_score") >= minQuality)
    val clean = decontaminate(s, dir)
      .filter(!col("contaminated")).select("doc_id")
    val split = stratifiedSplit(s, dir)
    keep.join(qual, "doc_id")
      .join(clean, "doc_id")
      .join(split, "doc_id")
      .select(col("doc_id"), col("lang"), col("split"), col("quality_score"))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Q28 — PII-style masking: count + redact email addresses and
    * digit runs per document. Codegen'd regexp projections, no
    * shuffle — the linear scan shape a redaction pass needs. The
    * patterns are engine-portable (same leftmost non-overlapping
    * semantics in Java regex and RE2).
    */
  def piiMask(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
        .cast("long").as("n_numbers"),
      regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        "[0-9]+", "<NUM>").as("masked"))

  /** Q29 — domain-mixture weighting: per (source, lang) corpus share
    * and the uniform-over-groups target sampling rate
    * `min(1, (N/G)/n_g)` — the rate that equalizes group volumes.
    * Two stages: a corpus-wide aggregate (narrow shuffle), then a
    * global window over the G-row aggregate — G = |sources×langs| is
    * tiny by construction, so the single-partition window is safe at
    * any corpus scale.
    */
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    val g = docs(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    // grand totals ride a broadcast scalar cross join — a
    // partitionBy()-less window here would serialize the group table
    // through one partition for two numbers
    val tot = g.agg(sum(col("n_docs")).as("total_docs"),
      count(lit(1)).as("n_groups"))
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"),
        (col("n_docs").cast("double") / col("total_docs").cast("double"))
          .as("share"),
        least(lit(1.0),
          (col("total_docs").cast("double") / col("n_groups").cast("double"))
            / col("n_docs").cast("double")).as("sample_rate"))
  }

  /** Q35 — benchmark decontamination: flag corpus documents sharing
    * ≥ `minShared` distinct 3-token shingles with a benchmark/eval set
    * (the GPT-3/Pile n-gram-overlap technique). The benchmark here is
    * the deterministic slice `doc_id % benchMod == 0`; in production
    * it is the eval suites — tiny relative to the corpus, which is
    * exactly why the plan broadcasts the benchmark's distinct shingle
    * set and keeps the corpus side to ONE doc_id-keyed shuffle
    * (partial count on the map side). `explode_outer` over the
    * per-document `array_distinct` keeps shingle-less docs in the
    * output with n_shared = 0 and dedups within-doc shingles without
    * any extra shuffle.
    */
  def decontaminate(s: SparkSession, dir: String,
                    benchMod: Long = 50L, minShared: Long = 3L): DataFrame = {
    val sh = docs(s, dir).select(col("doc_id"),
      array_distinct(TextHash.shingleHashes(col("text"))).as("sh"))
    val isBench = col("doc_id") % benchMod === 0
    val bench = sh.filter(isBench)
      .select(explode(col("sh")).as("h")).distinct()
      .withColumn("_hit", lit(1))
    sh.filter(!isBench)
      .select(col("doc_id"), explode_outer(col("sh")).as("h"))
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("_hit")).as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= minShared)
  }

  /** Q36 — deterministic quality-weighted downsampling: keep document
    * d iff `u(d) < quality_score(d)` where u is the hash-derived
    * uniform `polyHash(doc_id) % buckets / buckets`. A pure
    * projection on top of the Q18 quality pass — no RNG state, no
    * shuffle, reproducible across runs/partitionings/engines, and the
    * keep-probability equals the quality score, which is the
    * importance-sampling contract a data-mixing pipeline needs.
    */
  def qualitySample(s: SparkSession, dir: String,
                    buckets: Long = 10000L): DataFrame = {
    val u = (pmod(TextHash.polyHash(col("doc_id").cast("string")),
      lit(buckets)).cast("double") / lit(buckets.toDouble)).as("u")
    TextAnalysis.qualityScore(s, dir)
      .select(col("doc_id"), col("quality_score"), u)
      .withColumn("kept", col("u") < col("quality_score"))
  }

  /** Q37 — sequence packing: documents of a source are concatenated in
    * doc_id order and split into fixed `ctxLen`-token training
    * sequences (the standard pretraining concat-and-chunk). Each doc
    * gets its global token offset and the chunk ids it spans.
    *
    * The prefix sum is computed in TWO levels: per-bucket subtotals
    * (doc_id div `bucketSize`, ≤ bucketSize docs each) are
    * prefix-summed per source, then each doc adds its local exclusive
    * sum within its bucket. A single per-source window would sort a
    * whole source inside one task — the classic 100 TB skew trap when
    * one crawl dominates; here no window partition exceeds bucketSize
    * rows except the tiny per-source bucket-subtotal pass (corpus /
    * bucketSize rows). All arithmetic is integer-exact.
    */
  def packSequences(s: SparkSession, dir: String,
                    ctxLen: Long = 512L, bucketSize: Long = 1000L): DataFrame = {
    val d = docs(s, dir).select(
      col("source"), col("doc_id"),
      size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"),
      expr(s"doc_id div $bucketSize").as("bucket"))
    val wBuckets = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketStarts = d.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .select(col("source"), col("bucket"),
        coalesce(sum(col("bucket_tokens")).over(wBuckets), lit(0L))
          .as("bucket_start"))
    val wLocal = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val off = d
      .join(bucketStarts, Seq("source", "bucket"))
      .withColumn("start_off",
        col("bucket_start") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    off.select(col("source"), col("doc_id"), col("n_tokens"), col("start_off"),
      expr(s"start_off div $ctxLen").as("first_chunk"),
      when(col("n_tokens") === 0, lit(0L))
        .otherwise(expr(s"(start_off + n_tokens - 1) div $ctxLen") -
          expr(s"start_off div $ctxLen") + lit(1L)).as("n_chunks"))
  }

  /** Q40 — heavy-hitter tokens per source via the Misra-Gries sketch
    * UDAF ([[graft.functions.MgSketch]]): top-`m` tokens by count with
    * ≤ k counters of state per group through the exchange. With the
    * dev `k` far above the corpus vocabulary the counts are exact and
    * oracle-checkable; the saturated (approximate) regime is
    * property-pinned in MgSketchSpec.
    */
  def heavyHitters(s: SparkSession, dir: String,
                   k: Int = 1 << 16, m: Int = 5): DataFrame = {
    import s.implicits._
    val mg = new graft.functions.MgSketch(k)
    docs(s, dir)
      .select(col("source"), explode(TextHash.tokens(col("text"))).as("token"))
      .as[(String, String)]
      .groupByKey(_._1)
      .agg(mg.toColumn)
      .flatMap { case (src, top) =>
        top.take(m).zipWithIndex.map { case ((tok, cnt), i) =>
          (src, tok, cnt, (i + 1).toLong)
        }
      }
      .toDF("source", "token", "cnt", "rnk")
  }

  /** Q41 — deterministic per-source document sample: the `m` docs with
    * the smallest `polyHash(doc_id)` per source, via the
    * [[graft.functions.HashReservoir]] UDAF — bounded state, partial
    * aggregation, NO per-group sort or window (the scale-correct
    * top-k-per-group shape; a row_number window would sort every
    * group's full extent).
    */
  def groupSample(s: SparkSession, dir: String, m: Int = 10): DataFrame = {
    import s.implicits._
    val res = new graft.functions.HashReservoir(m)
    docs(s, dir)
      .select(col("source"),
        TextHash.polyHash(col("doc_id").cast("string")).as("h"),
        col("doc_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(res.toColumn)
      .flatMap { case (src, kept) =>
        kept.zipWithIndex.map { case ((_, id), i) => (src, id, (i + 1).toLong) }
      }
      .toDF("source", "doc_id", "rnk")
  }

  /** Training-shard sink: deterministic hash-sharded partitioned
    * parquet. Shard membership is `polyHash(doc_id) mod nShards` — a
    * pure function of the row, so re-running the writer reproduces
    * byte-identical shard membership regardless of cluster size or
    * input partitioning (what makes training-data builds auditable).
    * `repartition(shard)` co-locates each shard into one task and
    * `partitionBy` lays out `shard=K/` directories; rows are sorted by
    * doc_id within a shard so the files themselves are deterministic.
    */
  def writeShards(df: DataFrame, outDir: String, nShards: Int): Unit =
    df.withColumn("shard",
        pmod(TextHash.polyHash(col("doc_id").cast("string")), lit(nShards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)

  /** Q39 — end-to-end shard round-trip: write the documents table as
    * `nShards` hash shards, read the SHARDED FILES back, and summarize
    * per shard. The oracle recomputes the same membership arithmetic
    * directly, so a writer bug (dropped rows, mis-assigned shard,
    * partition-column mangling) fails the hash compare.
    */
  def shardSummary(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    writeShards(docs(s, dir), out, nShards)
    s.read.parquet(out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** Q125 — leakage-safe fit/transform: normalization parameters
    * (per-lang mean/std of n_chars) are FIT on the q46 train split
    * only, then APPLIED to every split — the invariant every feature
    * pipeline must hold (statistics computed on val/test leak the
    * evaluation into the features). Degenerate σ=0 cells yield null,
    * not ÷0.
    *
    * Scale shape: the fit is one decimal-exact sufficient-statistics
    * aggregate over the train slice (map-side combinable, group
    * cardinality = langs); the transform is a broadcast join + narrow
    * projection over the full corpus — the fit table is always tiny,
    * so the 100 TB cost is exactly one linear scan. sqrt is IEEE
    * correctly-rounded in both engines, so z-scores stay bit-stable.
    */
  def fitTransform(s: SparkSession, dir: String): DataFrame = {
    val splits = stratifiedSplit(s, dir)
    val j = splits.join(
      docs(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
    val st = j.filter(col("split") === "train")
      .select(col("lang"), col("n_chars").cast("decimal(20,4)").as("x"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("lang"), col("n_train"),
        (col("sx") / col("n_train")).as("mu"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n_train")) /
          col("n_train")).as("sigma"))
    j.join(broadcast(st), "lang")
      .select(col("doc_id"), col("lang"), col("split"), col("n_chars"),
        ((col("n_chars") - col("mu")) /
          when(col("sigma") =!= 0.0, col("sigma"))).as("z"))
  }

  /** Q193 — nucleus (top-p) source selection: per source, keep the
    * highest-value documents until `pPct`% of the source's character
    * mass is covered — the "smallest prefix covering p of the mass"
    * rule (nucleus sampling applied to corpus curation: cap each
    * source by VALUE share, not row count, so a source's long tail of
    * low-value bulk is what gets cut). Emits the full decision table
    * (every doc with its within-source running mass and keep flag),
    * not just survivors — auditable cuts.
    *
    * Exactness: the keep rule is pure integer arithmetic —
    * (cum_before)·100 < pPct·total — on exact long running sums;
    * ordering is total via (n_chars desc, doc_id). Every source keeps
    * at least its top document by construction.
    *
    * Scale shape: running mass from ONE two-level range-partitioned
    * [[GlobalRank.globalCumSum]] on (source, n_chars desc, doc_id) —
    * no per-source single-task sort — with per-source starts and
    * totals from a broadcast triangular join on the |sources|-row
    * totals table (the q184/q188 discipline).
    */
  def nucleusSelect(s: SparkSession, dir: String, pPct: Int = 50): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      col("n_chars").cast("long").as("n_chars"))
    val cum = GlobalRank.globalCumSum(d, col("n_chars"), "gcum",
      col("source"), col("n_chars").desc, col("doc_id"))
    val srcTot = d.groupBy(col("source")).agg(sum(col("n_chars")).as("tot"))
    val offs = srcTot.as("a")
      .join(srcTot.as("b"), col("b.source") < col("a.source"), "left")
      .groupBy(col("a.source").as("source"), col("a.tot").as("tot"))
      .agg(coalesce(sum(col("b.tot")), lit(0L)).as("soff"))
    cum.join(broadcast(offs), "source")
      .withColumn("cum_chars", col("gcum") - col("soff"))
      .select(col("source"), col("doc_id"), col("n_chars"), col("cum_chars"),
        ((col("cum_chars") - col("n_chars")) * lit(100L) <
          lit(pPct.toLong) * col("tot")).as("keep"))
  }

  /** Q192 — deterministic negative sampling: k pseudo-random
    * NEGATIVE partners per anchor document (the contrastive-training
    * and hard-negative-mining primitive) drawn by scrambled hash over
    * the corpus position space — reproducible across runs/engines, so
    * a training job can regenerate any batch's negatives from (doc,
    * j) alone. Anchor self-collisions are remapped deterministically
    * to the next position (never silently dropped, so every anchor
    * gets exactly k negatives).
    *
    * Scale shape: a position index (doc_id → dense 1..N rank) built
    * once by the two-level [[GlobalRank.globalRank]]; the ×k fan-out
    * is a narrow explode; resolving sampled positions to documents is
    * an equi-join on the position key (corpus-sized table, plain
    * hash-partitioned join — uniformly distributed keys by
    * construction, no skew). N is a one-row broadcast.
    */
  def negativeSample(s: SparkSession, dir: String, k: Int = 4): DataFrame = {
    // Eager checkpoint, not a lazy cache (round-18, the q217/C7
    // discipline): the position index feeds three concurrent branches
    // of one plan (the N scalar, the ×k fan-out, and the resolve-join
    // side), and branches racing a lazy cache re-run the two-level
    // global rank per branch. CONSUME-ONCE (see Graph.hits).
    val ranks = CheckpointOrphans.adopt(GlobalRank.globalRank(
      docs(s, dir).select(col("doc_id")), "pos", col("doc_id"))
      .localCheckpoint())
    val n = ranks.agg(count(lit(1)).as("n"))
    val fan = ranks.select(col("doc_id"), col("pos").as("apos"),
        explode(array((0 until k).map(j => lit(j)): _*)).as("j"))
      .crossJoin(broadcast(n))
      .withColumn("p",
        Relational.scrambleMod(TextHash.polyHash(
          concat(lit("neg:"), col("doc_id").cast("string"), lit(":"),
            col("j").cast("string")))) % col("n") + 1L)
      .withColumn("p2",
        when(col("p") === col("apos"), col("p") % col("n") + 1L)
          .otherwise(col("p")))
    fan.join(ranks.select(col("pos"), col("doc_id").as("neg_doc_id")),
        col("p2") === col("pos"))
      .select(col("doc_id"), col("j"), col("neg_doc_id"))
  }

  /** Q191 — deterministic epoch shuffle: the data-loader's per-epoch
    * corpus permutation as a DISTRIBUTED operator — each (epoch, doc)
    * gets a scrambled hash key, and the epoch-local position is an
    * exact global rank over that key. Reshuffling between epochs
    * without materializing new copies (positions are derived, the
    * corpus is read once), reproducible across runs and engines —
    * the property a resumable training job needs to skip to
    * mid-epoch sample N.
    *
    * Scale shape: the epoch fan-out is a narrow explode (×|epochs|);
    * positions come from ONE range-partitioned two-level
    * [[graft.operators.GlobalRank.globalRank]] on (epoch, key,
    * doc_id) — never a single-partition sort — with per-epoch starts
    * removed by the exact epoch·N offset (N is a one-row broadcast).
    * Hash keys are the shared polyHash+scramble integer chain (exact
    * in both engines).
    */
  def epochShuffle(s: SparkSession, dir: String, epochs: Int = 2): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val n = d.agg(count(lit(1)).as("n"))
    val fan = d.select(col("doc_id"),
        explode(array((0 until epochs).map(e => lit(e)): _*)).as("epoch"))
      .withColumn("k", Relational.scrambleMod(TextHash.polyHash(
        concat(lit("ep:"), col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")))))
    GlobalRank.globalRank(fan, "grank",
        col("epoch"), col("k"), col("doc_id"))
      .crossJoin(broadcast(n))
      .select(col("epoch"), col("doc_id"),
        (col("grank") - col("epoch").cast("long") * col("n")).as("pos"))
  }
}
