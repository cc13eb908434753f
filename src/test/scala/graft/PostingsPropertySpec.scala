package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Seeded randomized properties for the IVF postings lifecycle
  * (q297/q299/q300): every audit is recomputed by a SEQUENTIAL
  * reference (plain Scala folds in the engine's pinned association
  * order) over random gaussian corpora, including strata the sf
  * fixtures cannot produce (an existing stratum smaller than the
  * centroid count). The per-list counts are exact integers, so the
  * compare is bitwise.
  */
class PostingsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def withEmb(vecs: Seq[Array[Float]])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("postings_prop").toString
    try {
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      f(dir)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  /** Engine-order cosine: ascending fold from 0.0 (DotProductExpr). */
  private def dotd(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dotd(a, b) / math.sqrt(dotd(a, a) * dotd(b, b))

  /** Membership of ids under the engine's scramble (engine
    * arithmetic, not a reimplementation). */
  private def member(n: Int, prefix: String): Map[Long, Boolean] =
    spark.range(n).select(col("id"),
      graft.operators.Relational.scrambleMember(col("id"), prefix, 5)
        .as("m")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  /** Sequential nearest-centroid assignment under the frozen
    * existing-stratum quantizer: (vec_id -> owning list). */
  private def assign(dv: Seq[Array[Double]], inc: Map[Long, Boolean],
                     nCentroids: Int): Map[Long, Long] = {
    val cent = dv.indices.map(_.toLong).filterNot(inc).sorted
      .take(nCentroids).map(c => c -> dv(c.toInt))
    dv.indices.map { i =>
      val (cid, _) = cent.map { case (c, ce) => (c, cos(dv(i), ce)) }
        .minBy { case (c, sim) => (-sim, c) }
      i.toLong -> cid
    }.toMap
  }

  test("q297 refresh audit matches the sequential reference across seeds, empty-delta and quantizer-starved strata included") {
    // the smallest 'inc:'-member id is 15, so the n=12 and n=9 corpora
    // have an EMPTY incoming stratum (the delta generation carries
    // zero rows — n_new must be 0 everywhere), and nCent=64 > n makes
    // the quantizer the whole existing stratum
    for ((seed, n, nCent) <- Seq((101L, 40, 8), (202L, 25, 8),
        (303L, 12, 8), (404L, 9, 4), (505L, 20, 64))) {
      val rng = new java.util.Random(seed)
      val vecs = Seq.fill(n)(Array.fill(16)(rng.nextGaussian().toFloat))
      val dv = vecs.map(_.map(_.toDouble).toArray)
      val inc = member(n, "inc:")
      val own = assign(dv, inc, nCent)
      val want = own.groupBy(_._2).map { case (list, m) =>
        val ids = m.keys.toSeq
        (list, ids.count(!inc(_)).toLong, ids.count(inc(_)).toLong,
          ids.size.toLong)
      }.toSet
      withEmb(vecs) { dir =>
        val got = Similarity.ivfPostingsRefresh(spark, dir, nCent)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3))).toSet
        assert(got === want, s"seed=$seed n=$n nCent=$nCent")
      }
    }
  }

  test("q300 purge audit matches the sequential reference across seeds") {
    for ((seed, n) <- Seq((111L, 40), (222L, 22))) {
      val rng = new java.util.Random(seed)
      val vecs = Seq.fill(n)(Array.fill(16)(rng.nextGaussian().toFloat))
      val dv = vecs.map(_.map(_.toDouble).toArray)
      val purged = member(n, "purge:")
      assume(purged.values.exists(identity))
      // q300's quantizer is the full-corpus vec_id < nCentroids set
      val nCent = 8
      val cent = (0L until math.min(nCent.toLong, n.toLong))
        .map(c => c -> dv(c.toInt))
      val own = dv.indices.map { i =>
        val (cid, _) = cent.map { case (c, ce) => (c, cos(dv(i), ce)) }
          .minBy { case (c, sim) => (-sim, c) }
        i.toLong -> cid
      }.toMap
      val want = own.groupBy(_._2).map { case (list, m) =>
        val ids = m.keys.toSeq
        (list, ids.size.toLong, ids.count(purged(_)).toLong,
          ids.count(!purged(_)).toLong)
      }.toSet
      withEmb(vecs) { dir =>
        val got = Similarity.ivfPostingsPurge(spark, dir, nCent)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3))).toSet
        assert(got === want, s"seed=$seed n=$n")
      }
    }
  }

  test("q299 compaction is content-neutral on random corpora (including near-empty lists)") {
    val rng = new java.util.Random(777L)
    // a tight cluster + outliers makes some inverted lists near-empty
    val vecs = Seq.fill(30)(Array.fill(16)(rng.nextGaussian().toFloat)) ++
      Seq.fill(6)(Array.fill(16)((10f + rng.nextGaussian().toFloat)))
    withEmb(vecs) { dir =>
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("probe_id"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("sim"),
          r.getAs[Int]("rnk"))).toSet
      val direct = rows(Similarity.ivfDayTwoSearch(spark, dir))
      val compacted = rows(Similarity.ivfPostingsCompact(spark, dir))
      assert(direct.nonEmpty)
      assert(compacted === direct)
    }
  }

  test("q329 ADC search matches a sequential reference across seeds, codebook- and quantizer-starved strata included") {
    // the composite search restated as plain Scala folds in the
    // engine's pinned association order: frozen existing-stratum
    // quantizer, full-corpus codebook (the retrained v2 the switch
    // must serve), per-subspace argmin with the (sv·sv − 2·sv·cv) +
    // cv·cv distortion, flattened reconstruction, probe·recon ADC.
    // Scores compare EXACTLY — identical IEEE ops in identical order.
    for ((seed, nCent, cbK) <- Seq((41L, 4, 8), (97L, 4, 64),
        (131L, 32, 6))) { // cbK=64 > n: every subvector a codeword;
                          // nCent=32 > |existing|: starved quantizer
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(20)
      val nSub = 4; val subDim = 4; val nProbe = 2; val k = 5
      val vecs = Seq.fill(n)(Array.fill(16)(rnd.nextGaussian().toFloat))
      val dv = vecs.map(_.map(_.toDouble))
      val inc = member(n, "inc:")
      // frozen quantizer: nCent smallest existing ids, ranked per
      // vector by (cos desc, cid)
      val cent = dv.indices.map(_.toLong).filterNot(inc).sorted
        .take(nCent).map(c => c -> dv(c.toInt))
      def ranked(v: Array[Double]) =
        cent.map { case (c, ce) => (c, cos(v, ce)) }
          .sortBy { case (c, sim) => (-sim, c) }
      val owner = dv.indices.map(i => i.toLong -> ranked(dv(i)).head._1)
        .toMap
      // full-corpus codebook: subvectors of the cbK smallest ids
      val cws = dv.indices.map(_.toLong).sorted.take(cbK)
      def sub(v: Array[Double], j: Int) =
        v.slice(j * subDim, j * subDim + subDim)
      val recon = dv.indices.map { i =>
        i.toLong -> (0 until nSub).flatMap { j =>
          val sv = sub(dv(i), j)
          val best = cws.map { cw =>
            val cv = sub(dv(cw.toInt), j)
            (cw, dotd(sv, sv) - 2.0 * dotd(sv, cv) + dotd(cv, cv))
          }.minBy { case (cw, d) => (d, cw) }._1
          sub(dv(best.toInt), j)
        }.toArray
      }.toMap
      val want = (0L until 3L).flatMap { p =>
        val lists = ranked(dv(p.toInt)).take(nProbe).map(_._1).toSet
        dv.indices.map(_.toLong)
          .filter(v => v != p && lists(owner(v)))
          .map(v => (v, dotd(dv(p.toInt), recon(v))))
          .sortBy { case (v, s) => (-s, v) }.take(k).zipWithIndex
          .map { case ((v, s), r) => (p, v, s, r + 1) }
      }.toSet
      withEmb(vecs) { dir =>
        val got = Similarity.ivfPqSearch(spark, dir, nCent, nSub, subDim,
            cbK, 5, nProbe, k)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getInt(3))).toSet
        assert(got === want, s"seed=$seed n=$n nCent=$nCent cbK=$cbK")
      }
    }
  }
}
