package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def withEmbDir(vecs: Seq[Array[Float]])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    try {
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  private def randVecs(n: Int, dim: Int = 64, seed: Long = 11L): Seq[Array[Float]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  test("semanticDedup: keep-first within cluster, cross-cluster dups unseen, centroids broadcast") {
    // 4 "centroid" seeds (nCentroids=4), then near-copies of seed 0 and
    // an isolated vector. vec 4,5 ~ seed 0 (same cluster): 4 kept (dup
    // of 0, but 0 is smaller -> 0 kept, 4 and 5 dropped).
    val base = randVecs(4, seed = 7L)
    def jig(v: Array[Float], eps: Float) = v.map(x => x * (1.0f + eps))
    val vecs = base ++ Seq(jig(base(0), 0.01f), jig(base(0), 0.02f))
    withEmbDir(vecs) { dir =>
      val df = Similarity.semanticDedup(spark, dir, nCentroids = 4, tau = 0.95)
      val out = df.collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("cluster"), r.getAs[Boolean]("kept")))).toMap
      assert(out.size === 6)
      // scaled copies share cluster 0; keep-first drops 4 and 5 only
      assert(out(0L) === ((0L, true)) && out(4L) === ((0L, false)) &&
        out(5L) === ((0L, false)))
      assert(Seq(1L, 2L, 3L).forall(i => out(i)._2))
      // plan: centroid assignment must broadcast, never shuffle the corpus
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"), s"centroids not broadcast:\n$plan")
    }
  }

  test("powerIteration: recovers a planted dominant direction; lambda estimates its variance") {
    // Dim 2 carries variance ~100 (values ±10), every other dim noise
    // ~1e-4: the top eigenvector must concentrate on dim 2 and the
    // eigenvalue estimate must approach the planted variance.
    val rng = new java.util.Random(3L)
    val vecs = Seq.fill(40)(Array.tabulate(64)(d =>
      if (d == 1) (if (rng.nextBoolean()) 10f else -10f)
      else rng.nextGaussian().toFloat * 0.01f))
    withEmbDir(vecs) { dir =>
      val out = Similarity.powerIteration(spark, dir).collect()
        .map(r => r.getAs[Long]("dim_i") ->
          ((r.getAs[Double]("v"), r.getAs[Double]("lambda_est")))).toMap
      assert(out.size === 64)
      // normalized to max |component| = 1, achieved by the planted dim
      assert(math.abs(out(2L)._1) === 1.0)
      assert(out.filter(_._1 != 2L).values.forall(v => math.abs(v._1) < 0.01))
      val lambda = out(2L)._2
      // planted E[x²]−E[x]² is ~100 (±10 with a fair coin)
      assert(lambda > 90 && lambda < 110, s"lambda_est=$lambda")
    }
  }

  test("powerIteration: output satisfies the eigen equation C·v ≈ λ·v") {
    // A strong NON-axis-aligned common direction (big spectral gap →
    // 12 rounds converge far past the residual tolerance), plus noise
    // so the eigenvector isn't trivially sparse.
    val rng = new java.util.Random(5L)
    val u = Array.tabulate(64)(d => math.sin(d + 1.0).toFloat)
    val vecs = Seq.fill(30)({
      val s = if (rng.nextBoolean()) 10f else -10f
      Array.tabulate(64)(d => u(d) * s + rng.nextGaussian().toFloat * 0.01f)
    })
    withEmbDir(vecs) { dir =>
      val v = Similarity.powerIteration(spark, dir, iters = 12).collect()
        .map(r => (r.getAs[Long]("dim_i"), r.getAs[Double]("v"),
          r.getAs[Double]("lambda_est")))
      val lambda = v.head._3
      val vec = v.sortBy(_._1).map(_._2)
      val cov = Similarity.embedCovariance(spark, dir).collect()
        .map(r => (r.getAs[Long]("dim_i").toInt, r.getAs[Long]("dim_j").toInt,
          r.getAs[Double]("cov")))
      val cv = Array.fill(64)(0.0)
      cov.foreach { case (i, j, c) =>
        cv(i - 1) += c * vec(j - 1)
        if (i != j) cv(j - 1) += c * vec(i - 1)
      }
      // after 12 rounds the residual ‖Cv − λv‖∞ / λ is tiny
      val resid = cv.zip(vec).map { case (a, b) => math.abs(a - lambda * b) }.max
      assert(resid / lambda < 1e-6, s"residual $resid vs lambda $lambda")
    }
  }

  test("knnLabelEval: in-list neighbors match labels; singleton list reports isolated") {
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    try {
      def axis(d: Int, s: Float = 1f) =
        Array.tabulate(64)(i => if (i == d) s else 0f)
      def mix(d1: Int, a: Float, d2: Int, b: Float) =
        Array.tabulate(64)(i => if (i == d1) a else if (i == d2) b else 0f)
      // centroids: vec0 = e1 (label 1), vec1 = e2 (label 2); all other
      // vectors sit near e1 -> list B holds only its centroid
      val rows = Seq(
        (0L, axis(0), 1), (1L, axis(1), 2),
        (2L, mix(0, 1f, 2, 0.01f), 1), (3L, mix(0, 1f, 2, 0.011f), 1),
        (4L, mix(0, 0.9f, 3, 0.4f), 9))
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.knnLabelEval(spark, dir, nCentroids = 2).collect()
        .map(r => r.getAs[Int]("label") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_isolated"),
            r.getAs[Long]("n_matched"),
            Option(r.get(r.fieldIndex("nn_accuracy")))
              .map(_.asInstanceOf[Double])))).toMap
      assert(out(1) === ((3L, 0L, 3L, Some(1.0))))
      assert(out(2) === ((0L, 1L, 0L, None)))
      assert(out(9) === ((1L, 0L, 0L, Some(0.0))))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pcaTop2: recovers two planted orthogonal directions with their variances") {
    // Walsh-pattern signs (periods 2 and 4) over n=40: sample means 0,
    // cross-covariance EXACTLY 0, variances exactly 100 (dim 2) and
    // 25 (dim 5); everything else identically zero. All inputs and
    // intermediates are exact in binary floating point, so the first
    // eigen estimate is bitwise 100.0.
    val vecs = (0 until 40).map { k =>
      val s1 = if (k % 2 == 0) 1f else -1f
      val s2 = if (k % 4 < 2) 1f else -1f
      Array.tabulate(64)(d =>
        if (d == 1) 10f * s1 else if (d == 4) 5f * s2 else 0f)
    }
    withEmbDir(vecs) { dir =>
      val out = Similarity.pcaTop2(spark, dir).collect()
        .map(r => (r.getAs[Long]("component"), r.getAs[Long]("dim_i")) ->
          ((r.getAs[Double]("v"), r.getAs[Double]("lambda_est")))).toMap
      assert(out.size === 128)
      val (v1at2, lambda1) = out((1L, 2L))
      assert(math.abs(v1at2) === 1.0)
      assert(lambda1 === 100.0, s"lambda1=$lambda1")
      // the only other energy in component 1 is the decaying dim-5
      // leakage (0.25 -> 0.0625 -> 0.015625 over the 3 rounds)
      assert(math.abs(out((1L, 5L))._1) < 0.02)
      assert((1L to 64L).filter(d => d != 2L && d != 5L)
        .forall(d => out((1L, d))._1 === 0.0))
      val (v2at5, lambda2) = out((2L, 5L))
      assert(math.abs(v2at5) === 1.0)
      assert(lambda2 > 20.0 && lambda2 < 30.0, s"lambda2=$lambda2")
      // deflation removed the dominant direction
      assert(math.abs(out((2L, 2L))._1) < 0.2,
        s"component 2 still carries dim 2: ${out((2L, 2L))._1}")
    }
  }

  test("quantize: symmetric int8 with half-away-from-zero rounding; zero vector to zeros") {
    val vecs = Seq(
      Array(1.0f, 0.5f, -0.25f, 0.0f) ++ Array.fill(60)(0.0f),
      Array.fill(64)(0.0f))
    withEmbDir(vecs) { dir =>
      val qv = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          Similarity.quantize(transform(col("embedding"),
            x => x.cast("double"))).as("qv"))
        .collect().map(r => r.getAs[Long]("vec_id") ->
          r.getSeq[Long](1).take(4)).toMap
      // ma=1: 127, round(63.5)=64 (half away from zero), round(-31.75)=-32
      assert(qv(0L) === Seq(127L, 64L, -32L, 0L))
      assert(qv(1L) === Seq(0L, 0L, 0L, 0L))
    }
  }

  test("quantizedTopK: integer self-dot is the max score for a duplicate pair") {
    val base = randVecs(8, seed = 31L)
    val vecs = base.updated(5, base(0)) // vec 5 duplicates probe 0
    withEmbDir(vecs) { dir =>
      val out = Similarity.quantizedTopK(spark, dir, k = 3).collect()
        .filter(_.getAs[Long]("probe_id") == 0L)
        .sortBy(_.getAs[Int]("rnk"))
      // the duplicate must rank first for probe 0, with qdot = |q|^2
      assert(out.head.getAs[Long]("vec_id") === 5L)
      val q = Similarity.quantize(transform(col("embedding"), x => x.cast("double")))
      val selfDot = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") === 0L).select(q.as("qv"))
        .head().getSeq[Long](0).map(x => x * x).sum
      assert(out.head.getAs[Long]("qdot") === selfDot)
    }
  }

  test("quantFidelity: exactly-representable vectors reconstruct with qcos 1; noise stays near 1") {
    // ±1/0 entries are exact under quantize+dequantize (q = ±127,
    // dq = ±127·1/127 = ±1 exactly)
    val exact = Array(1.0f, -1.0f, 1.0f, 0.0f) ++ Array.fill(60)(0.0f)
    val vecs = Seq(exact) ++ randVecs(3, seed = 41L)
    val dir = java.nio.file.Files.createTempDirectory("embq").toString
    try {
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, i.toInt % 2) }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.quantFidelity(spark, dir).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("qcos")).toMap
      assert(out(0L) === 1.0)
      assert((1L to 3L).forall(i => out(i) > 0.99 && out(i) <= 1.0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("labelMargins: a planted mislabel gets margin < 0 and suspect = 1") {
    // Two tight clusters along axes 0 and 1. Vectors 0..3 point along
    // axis 0 (label 0), 4..7 along axis 1 (label 1) — except vector 7
    // ALSO points along axis 0 but carries label 1 (the mislabel).
    val rng = new java.util.Random(9L)
    def along(axis: Int) = Array.tabulate(64)(d =>
      (if (d == axis) 5f else 0f) + rng.nextGaussian().toFloat * 0.01f)
    val rows = (0 until 7).map(i => (i.toLong, along(if (i < 4) 0 else 1),
      if (i < 4) 0 else 1)) :+ ((7L, along(0), 1))
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    try {
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.labelMargins(spark, dir).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Double]("margin"), r.getAs[Long]("suspect"),
            r.getAs[Int]("best_other_label")))).toMap
      assert(out.size === 8)
      // clean vectors: strongly positive margin, not suspect
      (0L to 6L).foreach { i =>
        assert(out(i)._1 > 0.5, s"vec $i margin ${out(i)._1}")
        assert(out(i)._2 === 0L)
      }
      // the mislabeled vector is closer to label 0's centroid
      assert(out(7L)._1 < 0 && out(7L)._2 === 1L && out(7L)._3 === 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pqTopK: codebook members reconstruct exactly; scores are ADC dots") {
    // 20 vectors; the first 16 are the codebooks, so any corpus vector
    // that IS a codebook member encodes to itself per subspace (dist 0)
    // and its reconstruction is exact — the PQ score of probe p against
    // codebook-member v equals the TRUE dot(p, v).
    val vecs = randVecs(20, seed = 13L)
    withEmbDir(vecs) { dir =>
      val out = Similarity.pqTopK(spark, dir, k = 19).collect()
      // k rows per probe, never self
      val byProbe = out.groupBy(_.getAs[Long]("probe_id"))
      assert(byProbe.keySet === Set(0L, 1L, 2L))
      byProbe.values.foreach { rows =>
        assert(rows.length === 19)
        assert(rows.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("probe_id")))
        assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to 19))
      }
      def trueDot(p: Int, v: Int): Double =
        (0 until 64).foldLeft(0.0)((acc, i) =>
          acc + vecs(p)(i).toDouble * vecs(v)(i).toDouble)
      val scores = out.map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("vec_id")) -> r.getAs[Double]("score")).toMap
      // codebook members (vec_id 1..15) score exactly their true dot
      (1 to 15).filter(_ != 0).foreach { v =>
        assert(scores((0L, v.toLong)) === trueDot(0, v),
          s"PQ score for codebook member $v is not the exact dot")
      }
      // non-codebook vectors (16..19) are approximated, not exact
      assert((16 to 19).exists(v =>
        scores((0L, v.toLong)) !== trueDot(0, v)))
    }
  }

  test("kmeans: two separated blobs are recovered exactly after one recompute") {
    // blob A around +10 in dim 0, blob B around -10; init centroids are
    // vec 0 (in A) and vec 1 (in B), so Lloyd must converge immediately
    val rng = new java.util.Random(110)
    def blob(center: Float, n: Int) = Seq.fill(n) {
      val v = Array.fill(64)(rng.nextGaussian().toFloat * 0.1f)
      v(0) += center; v
    }
    // interleave so init (vec_id < 2) picks one from each blob
    val vecs = Seq(blob(10f, 1).head, blob(-10f, 1).head) ++
      blob(10f, 9) ++ blob(-10f, 9)
    withEmbDir(vecs) { dir =>
      val out = Similarity.kmeans(spark, dir, k = 2, iters = 2).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
      assert(out.size === 20)
      val aIds = Set(0L) ++ (2L until 11L)
      val bIds = Set(1L) ++ (11L until 20L)
      assert(aIds.forall(out(_) === 0L), s"blob A split: $out")
      assert(bIds.forall(out(_) === 1L), s"blob B split: $out")
    }
  }

  test("silhouette: separated blobs score near 1; agrees with the kmeans assignment") {
    val rng = new java.util.Random(127)
    def blob(center: Float, n: Int) = Seq.fill(n) {
      val v = Array.fill(64)(rng.nextGaussian().toFloat * 0.1f)
      v(0) += center; v
    }
    val vecs = Seq(blob(10f, 1).head, blob(-10f, 1).head) ++
      blob(10f, 9) ++ blob(-10f, 9)
    withEmbDir(vecs) { dir =>
      val km = Similarity.kmeans(spark, dir, k = 2, iters = 2).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
      val sil = Similarity.silhouette(spark, dir, k = 2, iters = 2).collect()
      assert(sil.length === 20)
      sil.foreach { r =>
        assert(r.getAs[Long]("cid") === km(r.getAs[Long]("vec_id")))
        val s = r.getAs[Double]("sil")
        assert(s > 0.9 && s <= 1.0, s"tight blob should score ~1, got $s")
        assert(r.getAs[Double]("dist_own") <= r.getAs[Double]("dist_next"))
      }
    }
  }

  test("kmeans is deterministic across runs and assignment distances are finite") {
    withEmbDir(randVecs(40)) { dir =>
      def run() = Similarity.kmeans(spark, dir, k = 4, iters = 2).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
          r.getAs[Double]("dist"))).sortBy(_._1).toSeq
      val a = run(); val b = run()
      assert(a === b)
      assert(a.forall { case (_, _, d) => !d.isNaN && d >= 0.0 })
      assert(a.map(_._2).distinct.size > 1, "degenerate single cluster")
    }
  }

  test("centroidsForCorpus keeps cluster occupancy bounded") {
    assert(Similarity.centroidsForCorpus(500L) === 8)
    assert(Similarity.centroidsForCorpus(1L << 20, targetCluster = 1024L) === 1024)
    assert(Similarity.centroidsForCorpus(1L << 30, targetCluster = 1024L) === (1 << 20))
  }

  test("q228 at scale: knnLabelEval with a centroidsForCorpus-sized quantizer keeps Σ|list|² linear") {
    // The registered q228 pins nCentroids=8 for oracle determinism;
    // this is the corpus-sized overload path the scaladoc prescribes:
    // c = n/targetCluster centroids keep expected occupancy at
    // targetCluster, so the candidate volume Σ|list|² stays ~n·target
    // instead of n²/c. Exercised, not just documented.
    val n = 96
    val target = 8L
    val c = Similarity.centroidsForCorpus(n.toLong, targetCluster = target)
    assert(c === n / target)
    val vecs = randVecs(n, seed = 41L)
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    try {
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, i % 3) }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.knnLabelEval(spark, dir, nCentroids = c).collect()
      assert(out.map(r => r.getAs[Long]("n_vecs") +
        r.getAs[Long]("n_isolated")).sum === n.toLong)
      out.foreach { r =>
        val acc = r.getAs[Double]("nn_accuracy")
        assert(acc.isNaN || (acc >= 0.0 && acc <= 1.0))
      }
      // occupancy through the SAME quantizer rule (nearest of the
      // vec_id < c seed centroids, cosine, tie by cid) that
      // knnLabelEval's list assignment uses; tau=2 disables dedup so
      // every vector reports its cluster
      val occ = Similarity.semanticDedup(spark, dir, nCentroids = c, tau = 2.0)
        .groupBy("cluster").count().collect().map(_.getAs[Long]("count"))
      assert(occ.sum === n.toLong)
      val maxOcc = occ.max
      val sumSq = occ.map(o => o * o).sum
      assert(maxOcc <= 4L * target,
        s"quantizer occupancy degenerate: max list $maxOcc vs target $target")
      assert(sumSq <= n.toLong * 4L * target,
        s"candidate volume superlinear: sum-of-squares $sumSq for n=$n")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("lshBucket: identical vectors share a bucket; negation flips every bit") {
    val planes = Similarity.hyperplanes()
    val v = randVecs(1).head.map(_.toDouble)
    val df = Seq((0L, v), (1L, v), (2L, v.map(-_)))
      .toDF("vec_id", "de")
      .withColumn("b", Similarity.lshBucket($"de", planes))
    val bs = df.orderBy("vec_id").collect().map(_.getAs[Long]("b"))
    assert(bs(0) === bs(1))
    assert(bs(2) === (~bs(0) & ((1L << Similarity.defaultPlanes) - 1)))
  }

  test("planesForCorpus grows log2 with corpus size, floored at the default") {
    assert(Similarity.planesForCorpus(1000L) === Similarity.defaultPlanes)
    assert(Similarity.planesForCorpus(1L << 30, targetBucket = 16L) === 26)
    assert(Similarity.planesForCorpus(1L << 40, targetBucket = 16L) === 36)
  }

  test("multi-probe recovers a pair whose buckets differ in exactly one bit") {
    // nudge the duplicate across exactly one hyperplane: buckets are 1
    // bit apart, so the plain same-bucket join would miss it but the
    // 1-bit probe must find it
    val planes = Similarity.hyperplanes()
    val v = randVecs(1, seed = 23L).head
    val vd = v.map(_.toDouble)
    val margins = planes.map(pl => pl.zip(vd).map { case (a, b) => a * b }.sum)
    val iMin = margins.indices.minBy(i => math.abs(margins(i)))
    val pl = planes(iMin)
    val nrm = pl.map(x => x * x).sum
    // reflect across plane iMin and push slightly beyond it
    val w = v.indices.map(d =>
      (vd(d) - 2.000001 * margins(iMin) / nrm * pl(d)).toFloat).toArray
    withEmbDir(Seq(v, w)) { dir =>
      val e = Similarity.embeddings(spark, dir)
        .select($"vec_id", transform($"embedding", x => x.cast("double")).as("de"))
        .withColumn("b", Similarity.lshBucket($"de", planes))
      val bks = e.orderBy("vec_id").collect().map(_.getAs[Long]("b"))
      assert(java.lang.Long.bitCount(bks(0) ^ bks(1)) === 1, "fixture must be 1 bit apart")
      val rows = Similarity.lshNearDup(spark, dir, minSim = 0.9).collect()
      assert(rows.exists(r => r.getLong(0) === 0L && r.getLong(1) === 1L))
    }
  }

  test("lshNearDup finds a planted duplicate pair with sim ~ 1") {
    val base = randVecs(30)
    val dup = base.head.clone()
    withEmbDir(base :+ dup) { dir =>
      val rows = Similarity.lshNearDup(spark, dir, minSim = 0.99).collect()
      assert(rows.exists(r =>
        r.getLong(0) === 0L && r.getLong(1) === 30L &&
          math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
    }
  }

  test("ivfTopK with nProbe = nCentroids equals brute-force top-k") {
    withEmbDir(randVecs(40)) { dir =>
      val brute = Similarity.bruteForceTopK(spark, dir, k = 5)
        .select("probe_id", "vec_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val ivf = Similarity.ivfTopK(spark, dir, nCentroids = 4, nProbe = 4, k = 5)
        .select("probe_id", "vec_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(ivf === brute)
    }
  }

  test("ivfTopK with nProbe < nCentroids returns k rows per probe from probed lists only") {
    withEmbDir(randVecs(60)) { dir =>
      val out = Similarity.ivfTopK(spark, dir, nCentroids = 6, nProbe = 2, k = 5)
      val perProbe = out.groupBy("probe_id").count().collect()
      assert(perProbe.length === 3)
      perProbe.foreach(r => assert(r.getLong(1) === 5L))
    }
  }

  test("dimStats: per-dimension mean/variance from quantized sums") {
    val dir = java.nio.file.Files.createTempDirectory("dimstats").toString
    try {
      Seq((0L, Array(1.0f, 3.0f)), (1L, Array(3.0f, 5.0f)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = graft.operators.Similarity.dimStats(spark, dir).collect()
        .map(r => r.getAs[Long]("dim") ->
          ((r.getAs[Double]("mean_v"), r.getAs[Double]("var_v")))).toMap
      assert(out(1L) === ((2.0, 1.0)))
      assert(out(2L) === ((4.0, 1.0)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("prefixRecall: the full-dimension prefix recovers truth exactly (recall 1)") {
    val out = graft.operators.Similarity
      .prefixRecall(spark, "/root/testdata/sf0.001", dims = Seq(64), k = 5)
      .collect()
    assert(out.length === 3) // one row per probe
    out.foreach { r =>
      assert(r.getAs[Long]("n_hit") === 5L)
      assert(r.getAs[Double]("recall") === 1.0)
    }
  }

  test("anisotropy: matches the brute-force pairwise mean; join-free identity") {
    val vecs = randVecs(12, dim = 8)
    withEmbDir(vecs) { dir =>
      val r = Similarity.anisotropy(spark, dir).collect().head
      val q = vecs.map(_.map(x => BigDecimal(x.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val n = q.length
      val self = q.map(v => dot(v, v)).sum / n
      val pair = (for { i <- q.indices; j <- q.indices if i != j }
        yield dot(q(i), q(j))).sum / (n.toDouble * (n - 1))
      assert(r.getAs[Long]("n_vectors") === n.toLong)
      assert(math.abs(r.getAs[Double]("mean_self_dot") - self) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_pairwise_dot") - pair) < 1e-9)
      assert(math.abs(r.getAs[Double]("anisotropy") - pair / self) < 1e-9)
      // a collapsed space (all-identical vectors) has ratio exactly 1
      withEmbDir(Seq.fill(5)(Array.fill(8)(0.5f))) { d2 =>
        val c = Similarity.anisotropy(spark, d2).collect().head
        assert(math.abs(c.getAs[Double]("anisotropy") - 1.0) < 1e-12)
      }
    }
  }

  private def coresetRows(dir: String, k: Int) =
    Similarity.coreset(spark, dir, k).collect()
      .map(r => (r.getAs[Int]("sel_round"), r.getAs[Long]("vec_id"),
        Option(r.getAs[java.lang.Double]("dmin")).map(_.toDouble))).toSeq

  test("coreset: hand-traced farthest-point rounds on planted 2-D points") {
    // points (padded to dim 4 with zeros): v0=(0,0) seed,
    // v1=(10,0), v2=(0,10), v3=(1,1).
    // round 2: dmin to v0 -> v1=100, v2=100, v3=2; tie at 100 -> v1.
    // round 3: v2 = min(100, 200) = 100; v3 = min(2, 82) = 2 -> v2.
    // round 4: v3 = min(2, 82, 82) = 2.
    def p(x: Float, y: Float) = Array(x, y, 0f, 0f)
    withEmbDir(Seq(p(0, 0), p(10, 0), p(0, 10), p(1, 1))) { dir =>
      assert(coresetRows(dir, k = 4) === Seq(
        (1, 0L, None),
        (2, 1L, Some(100.0)),
        (3, 2L, Some(100.0)),
        (4, 3L, Some(2.0))))
    }
  }

  test("coreset: an all-duplicates corpus still yields k distinct ids") {
    // every dmin after the seed is 0; the explicit already-selected
    // exclusion must walk the id order instead of re-picking the seed
    withEmbDir(Seq.fill(5)(Array.fill(4)(0.5f))) { dir =>
      val got = coresetRows(dir, k = 3)
      assert(got === Seq((1, 0L, None), (2, 1L, Some(0.0)), (3, 2L, Some(0.0))))
    }
  }

  test("coresetAssign: hand-computed coverage on the planted 2-D points") {
    // k=3 selects centers 0,1,2 (see the coreset trace); assignment:
    // v3=(1,1) has d=2 to c0 vs 82 to c1/c2 -> joins c0.
    // c0: n=2, radius=2, mean=(0+2)/2; c1/c2: singletons at 0.
    def p(x: Float, y: Float) = Array(x, y, 0f, 0f)
    withEmbDir(Seq(p(0, 0), p(10, 0), p(0, 10), p(1, 1))) { dir =>
      val got = Similarity.coresetAssign(spark, dir, k = 3).collect()
        .map(r => r.getAs[Long]("center_id") ->
          ((r.getAs[Long]("n_assigned"), r.getAs[Double]("radius_sq"),
            r.getAs[Double]("mean_sq")))).toMap
      assert(got === Map(
        0L -> ((2L, 2.0, 1.0)),
        1L -> ((1L, 0.0, 0.0)),
        2L -> ((1L, 0.0, 0.0))))
    }
  }

  test("coreset: a corpus smaller than k stops early with n rows") {
    def p(x: Float) = Array(x, 0f, 0f, 0f)
    withEmbDir(Seq(p(0), p(5))) { dir =>
      val got = coresetRows(dir, k = 8)
      assert(got === Seq((1, 0L, None), (2, 1L, Some(25.0))))
    }
  }

  test("coreset + assignment == sequential greedy reference on seeded random vectors") {
    // exact replica of the pinned arithmetic: float->double casts,
    // ascending-order sqDist fold, min over selected, argmax with
    // (dmin desc, vec_id) tie-break — so the comparison is EXACT on
    // selection and radius; the mean replicates the DECIMAL(38,10)
    // quantization
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    for (seed <- Seq(3L, 97L, 1223L)) {
      val k = 5
      val vecs = randVecs(17, dim = 16, seed = seed)
      val dv = vecs.map(_.map(_.toDouble))
      var selected = List(0)
      val want = scala.collection.mutable.ArrayBuffer(
        (1, 0L, Option.empty[Double]))
      var r = 2
      while (r <= k) {
        val cands = dv.indices.filterNot(selected.contains).map { i =>
          (i.toLong, selected.map(s => sq(dv(i), dv(s))).min)
        }
        val best = cands.sortBy(c => (-c._2, c._1)).head
        want += ((r, best._1, Some(best._2)))
        selected = selected :+ best._1.toInt
        r += 1
      }
      withEmbDir(vecs) { dir =>
        assert(coresetRows(dir, k) === want.toSeq, s"seed=$seed")
        // assignment reference: argmin (d, sid), per-center rollup
        val assign = dv.indices.map { i =>
          selected.map(s => (sq(dv(i), dv(s)), s.toLong)).minBy(identity)
        }
        val byC = assign.groupBy(_._2)
        val got = Similarity.coresetAssign(spark, dir, k).collect()
          .map(x => x.getAs[Long]("center_id") ->
            ((x.getAs[Long]("n_assigned"), x.getAs[Double]("radius_sq"),
              x.getAs[Double]("mean_sq")))).toMap
        assert(got.keySet === byC.keySet, s"seed=$seed centers")
        byC.foreach { case (c, ds) =>
          val (n, rad, mean) = got(c)
          assert(n === ds.size.toLong, s"seed=$seed n($c)")
          assert(rad === ds.map(_._1).max, s"seed=$seed radius($c)")
          val qsum = ds.map(d => BigDecimal(d._1)
            .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
          assert(math.abs(mean - qsum.toDouble / ds.size) < 1e-12,
            s"seed=$seed mean($c)")
        }
      }
    }
  }

  test("coreset: an EMPTY corpus degrades to an empty selection, not a throw") {
    // round-11 ADVICE: the seed collect()(0) threw on an empty
    // embeddings table while the oracle degraded to zero rows
    withEmbDir(Seq.empty) { dir =>
      assert(coresetRows(dir, k = 4) === Seq.empty)
      assert(Similarity.coresetAssign(spark, dir, k = 4).collect().isEmpty)
    }
  }

  test("coreset: outliers are covered before dense-cluster interiors") {
    // a tight cluster at the origin plus one far outlier: k-center
    // must take the outlier in round 2 (k-means would average it away)
    val cluster = (1 to 6).map(i => Array(i * 0.01f, 0f, 0f, 0f))
    val outlier = Array(100f, 0f, 0f, 0f)
    withEmbDir(cluster :+ outlier) { dir =>
      val got = coresetRows(dir, k = 2)
      assert(got.map(_._2) === Seq(0L, 6L))
    }
  }

  test("q292: search from the persisted codebook == inline q61 bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"),
        r.getAs[Int]("rnk"))).toSet
    val inline = rows(Similarity.pqTopK(spark, dir))
    val fromArt = rows(Similarity.pqTopKFromArtifact(spark, dir))
    assert(inline.nonEmpty)
    assert(fromArt === inline)
  }

  test("coresetIncremental == sequential frozen-prefix reference; radius audited vs full recompute") {
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // greedy farthest-point over candidate ids with a frozen prefix
    def greedy(dv: Seq[Array[Double]], cand: Int => Seq[Int], upTo: Int,
               pre: List[Int]): List[Int] = {
      var selected = pre
      for (r <- pre.size + 1 to upTo) {
        val cs = cand(r).filterNot(selected.contains)
          .map(i => (i.toLong, selected.map(s => sq(dv(i), dv(s))).min))
        selected = selected :+ cs.sortBy(c => (-c._2, c._1)).head._1.toInt
      }
      selected
    }
    def radius(dv: Seq[Array[Double]], sel: List[Int]): Double =
      dv.indices.map(i => sel.map(s => sq(dv(i), dv(s))).min).max
    for (seed <- Seq(5L, 271L)) {
      val (k1, k2) = (4, 7)
      val vecs = randVecs(19, dim = 16, seed = seed)
      val dv = vecs.map(_.map(_.toDouble))
      val member = spark.range(vecs.size).select(col("id"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash
          .polyHash(concat(lit("inc:"), col("id").cast("string"))))
          % 5 === 0L).as("inc")).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val exIds = dv.indices.filterNot(i => member(i.toLong)).toList
      assert(exIds.nonEmpty && dv.indices.exists(i => member(i.toLong)),
        s"seed=$seed fixture must carry both strata")
      // sequential reference: rounds 1..k1 over the existing stratum,
      // k1+1..k2 over the full corpus (frozen day-1 prefix)
      var selected = List(exIds.min)
      val want = scala.collection.mutable.ArrayBuffer(
        (1, exIds.min.toLong, Option.empty[Double], 0L))
      for (r <- 2 to k2) {
        val pool = if (r <= k1) exIds else dv.indices.toList
        val cs = pool.filterNot(selected.contains)
          .map(i => (i.toLong, selected.map(s => sq(dv(i), dv(s))).min))
        val best = cs.sortBy(c => (-c._2, c._1)).head
        want += ((r, best._1, Some(best._2), if (r > k1) 1L else 0L))
        selected = selected :+ best._1.toInt
      }
      withEmbDir(vecs) { dir =>
        val got = Similarity.coresetIncremental(spark, dir, k1, k2, 5)
          .collect().map(r => (r.getAs[Int]("sel_round"),
            r.getAs[Long]("vec_id"),
            Option(r.getAs[java.lang.Double]("dmin")).map(_.toDouble),
            r.getAs[Long]("is_new"))).toSeq.sortBy(_._1)
        assert(got === want.toSeq, s"seed=$seed")
      }
      // radius audit: the frozen-prefix selection covers within a small
      // factor of a full k2 recompute (both are deterministic here; the
      // pipeline signal is a day-1 prefix going stale as data shifts)
      val full = greedy(dv, _ => dv.indices.toList, k2, List(dv.indices.min))
      val rIncr = radius(dv, selected)
      val rFull = radius(dv, full)
      assert(rIncr <= 3.0 * rFull,
        s"seed=$seed incremental radius $rIncr vs full $rFull")
    }
  }

  private def searchRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("probe_id"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("sim"),
      r.getAs[Int]("rnk"))).toSet

  test("q296: search from the persisted postings generation == inline q16c bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val inline = searchRows(Similarity.ivfTopK(spark, dir))
    val fromArt = searchRows(Similarity.ivfPostingsRoundTrip(spark, dir))
    assert(inline.nonEmpty)
    assert(fromArt === inline)
  }

  test("q297: refresh audit — per-list identity and stratum-total conservation") {
    val dir = "/root/testdata/sf0.001"
    val audit = Similarity.ivfPostingsRefresh(spark, dir).collect()
      .map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("n_existing"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_total")))
    assert(audit.nonEmpty)
    audit.foreach { case (l, ex, nw, tot) =>
      assert(ex + nw === tot, s"list $l: $ex + $nw != $tot")
    }
    // conservation: the per-list sums must equal the scramble-split
    // stratum sizes of the raw corpus (no dropped or duplicated rows
    // through the base/delta generations)
    val m = spark.read.parquet(s"$dir/embeddings.parquet")
      .select((graft.operators.Relational.scrambleMod(graft.functions
        .TextHash.polyHash(concat(lit("inc:"),
          col("vec_id").cast("string")))) % 5 === 0L).as("inc"))
      .groupBy(col("inc")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(audit.map(_._2).sum === m.getOrElse(false, 0L))
    assert(audit.map(_._3).sum === m.getOrElse(true, 0L))
  }

  test("q299: postings compaction is content-neutral — compacted day-2 search == q298") {
    val dir = "/root/testdata/sf0.001"
    val direct = searchRows(Similarity.ivfDayTwoSearch(spark, dir))
    val compacted = searchRows(Similarity.ivfPostingsCompact(spark, dir))
    assert(direct.nonEmpty)
    assert(compacted === direct)
  }

  test("q300: purge audit — per-list identity; totals match the purge membership") {
    val dir = "/root/testdata/sf0.001"
    val audit = Similarity.ivfPostingsPurge(spark, dir).collect()
      .map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_purged"), r.getAs[Long]("n_after")))
    assert(audit.nonEmpty)
    audit.foreach { case (l, b, p, a) =>
      assert(p + a === b, s"list $l: $p + $a != $b")
    }
    val m = spark.read.parquet(s"$dir/embeddings.parquet")
      .select((graft.operators.Relational.scrambleMod(graft.functions
        .TextHash.polyHash(concat(lit("purge:"),
          col("vec_id").cast("string")))) % 5 === 0L).as("p"))
      .groupBy(col("p")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(audit.map(_._2).sum === m.values.sum) // every vector indexed
    assert(audit.map(_._3).sum === m.getOrElse(true, 0L))
    assert(audit.map(_._4).sum === m.getOrElse(false, 0L))
  }

  test("q302: frozen-codebook encode matches a sequential reference; every incoming subvector encodes") {
    val (nSub, subDim, cbK, modN) = (2, 4, 3, 5)
    val dim = nSub * subDim
    val rng = new java.util.Random(509L)
    val vecs = Seq.fill(24)(Array.fill(dim)(rng.nextGaussian().toFloat))
    // membership of ids under the 'inc:' scramble (engine arithmetic)
    val inc = spark.range(vecs.size).select(col("id"),
      (graft.operators.Relational.scrambleMod(graft.functions.TextHash
        .polyHash(concat(lit("inc:"), col("id").cast("string"))))
        % modN === 0L).as("inc")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assume(inc.values.exists(identity) && inc.values.exists(!_))
    // sequential reference: left-assoc double folds from 0.0, argmin
    // by (dist, codeword id)
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val dv = vecs.map(_.map(_.toDouble))
    val cwIds = inc.collect { case (id, false) => id }.toSeq.sorted.take(cbK)
    val want = (for {
      id <- inc.collect { case (i, true) => i }.toSeq.sorted
      j <- 0 until nSub
    } yield {
      val sv = dv(id.toInt).slice(j * subDim, j * subDim + subDim)
      val (code, dist) = cwIds.map { cw =>
        val cv = dv(cw.toInt).slice(j * subDim, j * subDim + subDim)
        (cw, dotd(sv, sv) - 2.0 * dotd(sv, cv) + dotd(cv, cv))
      }.minBy { case (cw, d) => (d, cw) }
      (id, j, code, dist)
    }).toSet
    withEmbDir(vecs) { dir =>
      val got = Similarity.pqFrozenEncode(spark, dir, nSub, subDim, cbK, modN)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j"),
          r.getAs[Long]("code"), r.getAs[Double]("distortion"))).toSet
      assert(got === want)
      // totality: |incoming| · nSub rows — an unseen vector always
      // encodes under a frozen codebook
      assert(got.size === inc.values.count(identity) * nSub)
    }
  }

  test("q304: manifest-resolved day-2 search == q298 (the switch changes dirs, never content)") {
    val dir = "/root/testdata/sf0.001"
    val direct = searchRows(Similarity.ivfDayTwoSearch(spark, dir))
    val viaManifest = searchRows(Similarity.ivfManifestSearch(spark, dir))
    assert(direct.nonEmpty)
    assert(viaManifest === direct)
  }

  test("q306: post-retrain search through the switched manifest == inline q16c") {
    val dir = "/root/testdata/sf0.001"
    val inline = searchRows(Similarity.ivfTopK(spark, dir))
    val switched = searchRows(Similarity.ivfRetrainSwitch(spark, dir))
    assert(inline.nonEmpty)
    assert(switched === inline)
  }

  test("q307: GC deletes the retired generations from disk; post-GC search == q298") {
    val dir = "/root/testdata/sf0.001"
    val (deleted, search) =
      Similarity.generationGc(spark, dir, 8, 5, 2, 5)
    assert(deleted.size === 2, s"expected base+delta retired, got $deleted")
    deleted.foreach(d => assert(!new java.io.File(d).exists,
      s"retired generation $d still on disk"))
    val direct = searchRows(Similarity.ivfDayTwoSearch(spark, dir))
    assert(direct.nonEmpty)
    assert(searchRows(search) === direct)
  }

  test("q308: time travel returns yesterday's answers — no incoming vector can be a hit") {
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.ivfTimeTravel(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id"))
    assert(got.nonEmpty)
    val incIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"))
      .filter(graft.operators.Relational.scrambleMod(graft.functions
        .TextHash.polyHash(concat(lit("inc:"),
          col("vec_id").cast("string")))) % 5 === 0L)
      .collect().map(_.getLong(0)).toSet
    assert(incIds.nonEmpty, "split must produce incoming vectors")
    got.foreach(id => assert(!incIds(id),
      s"incoming vector $id leaked into the day-1 snapshot search"))
  }

  test("q305: drift audit matches a sequential reference; empty strata degrade to NULL means") {
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.quantizerDrift(spark, dir).collect()
      .map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("n_existing"),
        r.getAs[Long]("n_new"),
        Option(r.getAs[java.lang.Double]("mean_dist_existing")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("mean_dist_new")).map(_.toDouble)))
      .sortBy(_._1).toSeq
    assert(got.nonEmpty)
    // sequential reference from the raw table: the 'inc:' split, the
    // existing stratum's smallest-8 centroids, left-assoc cosine
    // folds, HALF_UP decimal(?,10) summands
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash
          .polyHash(concat(lit("inc:"), col("vec_id").cast("string"))))
          % 5 === 0L).as("inc"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getBoolean(2)))
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotd(a, b) / math.sqrt(dotd(a, a) * dotd(b, b))
    val cent = raw.filter(!_._3).sortBy(_._1).take(8)
      .map(r => (r._1, r._2))
    val assigned = raw.map { case (id, de, inc) =>
      val (cid, _) = cent.map { case (c, ce) => (c, cos(de, ce)) }
        .minBy { case (c, s) => (-s, c) }
      (cid, 1.0 - cos(de, cent.find(_._1 == cid).get._2), inc)
    }
    def mean(cds: Seq[Double]): Option[Double] =
      if (cds.isEmpty) None
      else Some(cds.map(d => new java.math.BigDecimal(d)
          .setScale(10, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue / cds.size)
    val want = assigned.groupBy(_._1).toSeq.map { case (cid, rows) =>
      val ex = rows.filter(!_._3).map(_._2).toSeq
      val nw = rows.filter(_._3).map(_._2).toSeq
      (cid, ex.size.toLong, nw.size.toLong, mean(ex), mean(nw))
    }.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)) ===
      want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      def close(a: Option[Double], b: Option[Double]) = (a, b) match {
        case (None, None) => true
        case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
        case _ => false
      }
      assert(close(g._4, w._4) && close(g._5, w._5),
        s"list ${g._1}: got (${g._4}, ${g._5}) want (${w._4}, ${w._5})")
    }
  }

  test("q316: PQ codebook drift matches a sequential reference per subspace") {
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.pqCodebookDrift(spark, dir).collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Long]("n_existing"),
        r.getAs[Long]("n_new"),
        Option(r.getAs[java.lang.Double]("mean_dist_existing")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("mean_dist_new")).map(_.toDouble)))
      .sortBy(_._1).toSeq
    assert(got.map(_._1) === (0 until 8),
      "every subspace must report a drift row")
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"),
        (graft.operators.Relational.scrambleMod(graft.functions.TextHash
          .polyHash(concat(lit("inc:"), col("vec_id").cast("string"))))
          % 5 === 0L).as("inc"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getBoolean(2)))
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val cb = raw.filter(!_._3).sortBy(_._1).take(16)
    def argminDist(sv: Array[Double], j: Int): Double =
      cb.map { case (cw, de, _) =>
        val cv = de.slice(j * 8, j * 8 + 8)
        (dotd(sv, sv) - 2.0 * dotd(sv, cv) + dotd(cv, cv), cw)
      }.minBy(identity)._1
    def mean(ds: Seq[Double]): Option[Double] =
      if (ds.isEmpty) None
      else Some(ds.map(d => new java.math.BigDecimal(d)
          .setScale(10, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue / ds.size)
    val want = (0 until 8).map { j =>
      val dists = raw.map { case (_, de, inc) =>
        (argminDist(de.slice(j * 8, j * 8 + 8), j), inc) }
      val ex = dists.filter(!_._2).map(_._1).toSeq
      val nw = dists.filter(_._2).map(_._1).toSeq
      (j, ex.size.toLong, nw.size.toLong, mean(ex), mean(nw))
    }
    assert(got.map(t => (t._1, t._2, t._3)) ===
      want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      def close(a: Option[Double], b: Option[Double]) = (a, b) match {
        case (None, None) => true
        case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
        case _ => false
      }
      assert(close(g._4, w._4) && close(g._5, w._5),
        s"subspace ${g._1}: got (${g._4}, ${g._5}) want (${w._4}, ${w._5})")
    }
  }

  test("q317: the atomic switch lands the retrained codebook — encode differs from the frozen q302 encode; every incoming subvector encodes") {
    val dir = "/root/testdata/sf0.001"
    def codeRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j"),
        r.getAs[Long]("code"), r.getAs[Double]("distortion"))).toSet
    val switched = codeRows(Similarity.pqRetrainSwitch(spark, dir))
    val frozen = codeRows(Similarity.pqFrozenEncode(spark, dir))
    assert(switched.nonEmpty)
    // totality under the retrained codebook: same (vec_id, j) keys as
    // the frozen encode — every incoming subvector still encodes
    assert(switched.map(t => (t._1, t._2)) === frozen.map(t => (t._1, t._2)))
    // the switch is VISIBLE: the full-corpus codebook includes
    // incoming codewords the frozen one cannot, so some assignments
    // (or at least distortions) must change — equality here would
    // mean resolve() served the stale generation
    assert(switched !== frozen,
      "post-switch encode identical to the frozen encode — the " +
        "manifest switch did not land")
  }

  test("q318: three-day soak — GC'd generations gone, kept window intact, final search == q298") {
    val dir = "/root/testdata/sf0.001"
    val (root, deleted, search) =
      Similarity.lifecycleSoak(spark, dir, 8, 5, 2, 5)
    // day-0 base + d0 + c0 + d1 retired across the three retention
    // passes (d2/c1 stay inside the keepLast=2 window, c2 is live)
    assert(deleted.size === 4, s"expected 4 GC'd generations, got $deleted")
    deleted.foreach(d => assert(!new java.io.File(d).exists,
      s"GC'd generation $d still on disk"))
    // the resolved live set (and the kept window's dirs) survive
    val live = graft.operators.IndexManifest.resolve(spark, root)
    assert(live.size === 1 && live.head.contains("soakc2"))
    graft.operators.IndexManifest.committedIds(spark, root).foreach { id =>
      graft.operators.IndexManifest.resolveAt(spark, root, id).foreach(g =>
        assert(new java.io.File(g).isDirectory,
          s"kept-window generation $g missing from disk"))
    }
    val direct = searchRows(Similarity.ivfDayTwoSearch(spark, dir))
    assert(direct.nonEmpty)
    assert(searchRows(search) === direct)
  }

  test("q321: PQ time travel returns yesterday's codes — equal to the frozen encode, not the retrained one") {
    val dir = "/root/testdata/sf0.001"
    def codeRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j"),
        r.getAs[Long]("code"), r.getAs[Double]("distortion"))).toSet
    val tt = codeRows(Similarity.pqTimeTravel(spark, dir))
    val frozen = codeRows(Similarity.pqFrozenEncode(spark, dir))
    val switched = codeRows(Similarity.pqRetrainSwitch(spark, dir))
    assert(tt.nonEmpty)
    // resolveAt(day-1) must serve ONLY the frozen codebook...
    assert(tt === frozen,
      "time-travel encode differs from the frozen encode — resolveAt " +
        "did not serve the day-1 snapshot")
    // ...which the q317 spec already proved differs from the
    // retrained encode; restate the contrast on this pair directly
    assert(tt !== switched,
      "time-travel encode equals the retrained encode — the snapshot " +
        "read leaked the switch")
  }

  test("q329: the composite switch serves the retrained codebook+postings pair from ONE manifest — never a mixed version") {
    val dir = "/root/testdata/sf0.001"
    val (root, parts, search) =
      Similarity.ivfPqParts(spark, dir, 8, 8, 8, 16, 5, 2, 5)
    // both families resolve from the SAME (latest) commit: the v2 pair
    val cbs = parts(graft.operators.IndexManifest.PqCodebookFormat)
    val posts = parts(graft.operators.IndexManifest.IvfPqPostingsFormat)
    assert(cbs.size === 1 && cbs.head.contains("ivfpq_cb2"),
      s"switch must serve the retrained codebook: $cbs")
    assert(posts.size === 1 && posts.head.contains("ivfpq_posts2"),
      s"switch must serve the re-coded postings: $posts")
    // the v1 pair stays committed (time travel) but is not served
    assert(graft.operators.IndexManifest.committedIds(spark, root)
      .size === 2)
    val snap1 = graft.operators.IndexManifest.committedIds(spark, root).head
    val v1 = graft.operators.IndexManifest.resolveAt(spark, root, snap1)
    assert(v1.exists(_.contains("ivfpq_cb1")) &&
      v1.exists(_.contains("ivfpq_posts1")),
      s"the day-1 snapshot must pin the frozen pair: $v1")
    // every persisted posting carries exactly nSub codes — the
    // 32×-smaller row the composite layout exists for
    val badLen = Similarity.readIvfPqPostings(spark, posts.head)
      .filter(org.apache.spark.sql.functions.size(col("codes")) =!= 8)
      .count()
    assert(badLen === 0L, s"$badLen postings rows without nSub codes")
    // and the served search is non-degenerate (the oracle pins its
    // exact content against the inline v2 ADC restatement)
    assert(search.count() > 0)
  }

  test("q330: lifecycle recall is 1.0 on every probe when nProbe = nCentroids — probing every list IS the exact scan") {
    val dir = "/root/testdata/sf0.001"
    val (_, recall) =
      Similarity.lifecycleRecallParts(spark, dir, 8, 5, 8, 5)
    val rows = recall.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall")))
    assert(rows.length === 3, s"expected the 3 fixed probes: ${rows.toSeq}")
    rows.foreach { case (p, n, rc) =>
      assert(n === 5L && rc === 1.0,
        s"probe $p: recall $rc ($n/5) — the lifecycle-served index " +
          "missed true neighbours even with every list probed")
    }
  }

  test("q334: the composite compaction is one file per list; the codebook rolls forward unchanged") {
    val dir = "/root/testdata/sf0.001"
    val (folded, search) =
      Similarity.compactCoded(spark, dir, 8, 8, 8, 16, 5, 2, 5)
    val lists = new java.io.File(folded).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list="))
    assert(lists.nonEmpty, s"no list dirs under $folded")
    lists.foreach { ld =>
      val parts = ld.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"list ${ld.getName} has ${parts.length} files after compaction")
    }
    assert(search.count() > 0)
  }

  test("q335: composite time travel serves yesterday's codebook WITH yesterday's codes — equal to the frozen day-2 state, not the retrained one") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val tt = rows(Similarity.ivfPqTimeTravel(spark, dir))
    val frozen = rows(Similarity.ivfPqDayTwoSearch(spark, dir))
    val switched = rows(Similarity.ivfPqSearch(spark, dir))
    assert(tt.nonEmpty)
    // the v1 postings ARE the corpus coded under the frozen codebook,
    // so the pinned snapshot must reproduce the day-2 search exactly
    assert(tt === frozen,
      "time-travel search differs from the frozen-codebook search — " +
        "resolvePartsAt did not serve the v1 pair")
    // ...and must NOT equal the retrained search the live head serves
    assert(tt !== switched,
      "time-travel search equals the retrained search — the snapshot " +
        "read leaked the composite switch")
  }

  test("q336: composite soak — 4 postings generations GC'd, the SHARED codebook survives every retention pass") {
    val dir = "/root/testdata/sf0.001"
    val (root, cb, deleted, search) =
      Similarity.ivfPqSoakParts(spark, dir, 8, 8, 8, 16, 5, 2, 5)
    // keepLast = 2 walks the window forward each day: base, d0, c0, d1
    // become exclusive to retired snapshots and go
    assert(deleted.size === 4, s"expected 4 GC'd generations: $deleted")
    Seq("ivfpq_soak_base", "ivfpq_soak_d0", "ivfpq_soak_c0",
      "ivfpq_soak_d1").foreach(tag =>
      assert(deleted.exists(_.contains(tag)), s"$tag not GC'd: $deleted"))
    deleted.foreach(g => assert(!new java.io.File(g).exists,
      s"GC'd generation still on disk: $g"))
    // the codebook generation is named by EVERY commit, so it is never
    // exclusive to a retired snapshot — retire must keep it or every
    // later resolve serves undecodable codes
    assert(!deleted.contains(cb) && new java.io.File(cb).isDirectory,
      "retention deleted the shared codebook generation")
    val parts = graft.operators.IndexManifest.resolveParts(spark, root,
      Set(graft.operators.IndexManifest.PqCodebookFormat,
        graft.operators.IndexManifest.IvfPqPostingsFormat))
    assert(parts(graft.operators.IndexManifest.PqCodebookFormat)
      === Seq(cb))
    val posts = parts(graft.operators.IndexManifest.IvfPqPostingsFormat)
    assert(posts.size === 1 && posts.head.contains("ivfpq_soak_c2"),
      s"final resolve must serve the day-3 compaction alone: $posts")
    // kept window intact on disk
    graft.operators.IndexManifest.committedIds(spark, root).foreach { id =>
      graft.operators.IndexManifest.resolveAt(spark, root, id).foreach(g =>
        assert(new java.io.File(g).isDirectory,
          s"kept snapshot m_$id names a missing generation: $g"))
    }
    assert(search.count() > 0)
  }

  test("q340: the three-way switch serves quantizer+codebook+postings from ONE commit; resolvePartsAt pinned to v1 serves yesterday's quantizer WITH yesterday's lists") {
    val dir = "/root/testdata/sf0.001"
    val F = graft.operators.IndexManifest
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val (root, parts, search) =
      Similarity.ivfPqRetrainParts(spark, dir, 8, 8, 8, 16, 5, 2, 5)
    // the head serves the retrained TRIPLE — all three families from
    // one commit, the quantizer no longer a memoized side channel
    assert(parts(F.IvfCentroidsFormat).size === 1 &&
      parts(F.IvfCentroidsFormat).head.contains("ivfpq_rt_cent2"),
      s"switch must serve the retrained quantizer: $parts")
    assert(parts(F.PqCodebookFormat).head.contains("ivfpq_rt_cb2") &&
      parts(F.IvfPqPostingsFormat).head.contains("ivfpq_rt_posts2"),
      s"switch must serve the retrained codebook and re-coded " +
        s"postings: $parts")
    // three-way time travel: the v1 snapshot pins yesterday's
    // quantizer WITH yesterday's codebook AND yesterday's lists
    val snap1 = F.committedIds(spark, root).head
    val v1 = F.resolvePartsAt(spark, root, snap1, Similarity.IvfPqComposite)
    assert(v1(F.IvfCentroidsFormat).head.contains("ivfpq_rt_cent1") &&
      v1(F.PqCodebookFormat).head.contains("ivfpq_rt_cb1") &&
      v1(F.IvfPqPostingsFormat).head.contains("ivfpq_rt_posts1"),
      s"the day-1 snapshot must pin the frozen triple: $v1")
    val v1Search = rows(Similarity.ivfPqSearchFromParts(spark, dir, v1,
      nProbe = 2, k = 5))
    // the v1 triple IS the full corpus listed+coded under the frozen
    // quantizer and codebook — exactly the day-2 composite state, so
    // the pinned search must reproduce it row for row
    assert(v1Search === rows(Similarity.ivfPqDayTwoSearch(spark, dir)),
      "v1-pinned search differs from the frozen-pair search — " +
        "resolvePartsAt did not serve yesterday's quantizer with " +
        "yesterday's lists")
    // ...and must NOT equal the retrained head: the retrain re-routes
    // every probe and re-codes every vector
    assert(v1Search !== rows(search),
      "v1-pinned search equals the retrained search — the snapshot " +
        "read leaked the three-way switch")
  }

  test("q342: the composite sweep reclaims the crashed re-code PAIR and the crashed manifest; every committed generation — the codebook included — survives") {
    val dir = "/root/testdata/sf0.001"
    val (root, swept, committed, search) =
      Similarity.ivfPqOrphanParts(spark, dir, 8, 8, 8, 16, 5, 2, 5)
    // both halves of the crashed re-code are reclaimed — and nothing
    // else: the sweep's reference set read EVERY format row, so the
    // live codebook was never mistaken for a stray
    assert(swept.size === 2, s"expected exactly the stray pair: $swept")
    assert(swept.exists(_.endsWith("stray_cb")) &&
      swept.exists(_.endsWith("stray_recode")),
      s"expected the crashed codebook AND re-coded postings: $swept")
    swept.foreach(g => assert(!new java.io.File(g).exists,
      s"swept stray still on disk: $g"))
    // the crashed manifest dir is gone too (its id is re-allocatable)
    assert(!new java.io.File(s"$root/m_99").exists,
      "the half-written manifest dir survived the sweep")
    // every generation a committed manifest names is intact on disk
    // and still resolving — codebook, base, and delta
    committed.foreach(g => assert(new java.io.File(g).isDirectory,
      s"the sweep deleted a committed generation: $g"))
    val F = graft.operators.IndexManifest
    val parts = F.resolveParts(spark, root,
      Set(F.PqCodebookFormat, F.IvfPqPostingsFormat))
    assert(parts(F.PqCodebookFormat) === Seq(committed.head) &&
      parts(F.IvfPqPostingsFormat) === committed.tail,
      s"post-sweep resolve must serve the committed composite: $parts")
    // both snapshots still time-travel (the sweep touches no
    // committed manifest)
    assert(F.committedIds(spark, root).size === 2)
    assert(search.count() > 0)
  }

  test("q332: with every vector a codeword and every list probed, ADC degrades to exact max-inner-product search") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"))
    val n = e.count().toInt
    // codebookK = corpus size: every subvector IS a codeword, so the
    // argmin hits distance 0 and the reconstruction is bitwise exact
    // (ties across duplicate subvectors pick a different cw but the
    // identical cv); nProbe = nCentroids scans every list
    val adc = Similarity.ivfPqSearch(spark, dir, nCentroids = 8,
        nSub = 8, subDim = 8, codebookK = n, modN = 5, nProbe = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("de").as("pe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val mips = probes.crossJoin(e)
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("score", Similarity.dot(col("pe"), col("de")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"),
        r.getAs[Int]("rnk"))).toSet
    assert(adc.nonEmpty)
    assert(adc === mips,
      "zero-reconstruction-error ADC must equal exact MIPS " +
        "score-for-score — the coded path distorted a vector")
  }

  test("q343: post-retrain ADC with every vector a codeword and every list probed still degrades to exact MIPS — re-listing is a pure routing change") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"))
    val n = e.count().toInt
    // the q332 limit under the RETRAINED quantizer: different centers
    // route vectors to different lists, but with nProbe = nCentroids
    // every list is scanned and with codebookK = corpus size the
    // reconstruction is bitwise exact — so the routing change must be
    // invisible in the output
    val adc = Similarity.ivfPqQuantizerRetrain(spark, dir, nCentroids = 8,
        nSub = 8, subDim = 8, codebookK = n, modN = 5, nProbe = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("de").as("pe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val mips = probes.crossJoin(e)
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("score", Similarity.dot(col("pe"), col("de")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"),
        r.getAs[Int]("rnk"))).toSet
    assert(adc.nonEmpty)
    assert(adc === mips,
      "zero-reconstruction-error ADC under the retrained quantizer " +
        "must equal exact MIPS — the re-list dropped or duplicated " +
        "a vector")
  }

  test("postings sink/source: exact row round trip; an EMPTY generation reads as an empty relation") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_postings_spec").toString
    try {
      val rows = Seq((0L, Array(1.0, 2.0), 0L), (5L, Array(3.0, 4.0), 0L),
        (3L, Array(0.5, 0.25), 2L))
      rows.toDF("vec_id", "de", "list")
        .createOrReplaceTempView("postings_spec_in")
      Similarity.writeIvfPostings(spark.table("postings_spec_in"), out)
      val back = Similarity.readIvfPostings(spark, out).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getLong(2)))
        .toSet
      assert(back === rows.map(r => (r._1, r._2.toSeq, r._3)).toSet)
      // explicit-schema contract: a generation with zero part files
      // (degenerate corpus) must read as an EMPTY relation, never fail
      // parquet schema inference
      val empty = java.nio.file.Files
        .createTempDirectory("graft_ivf_postings_empty").toString
      try assert(Similarity.readIvfPostings(spark, empty).count() === 0L)
      finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(empty))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("q294: search from the persisted IVF quantizer == inline q16c bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("sim"),
        r.getAs[Int]("rnk"))).toSet
    val inline = rows(Similarity.ivfTopK(spark, dir))
    val fromArt = rows(Similarity.ivfTopKFromArtifact(spark, dir))
    assert(inline.nonEmpty)
    assert(fromArt === inline)
  }

  test("coresetIncremental: stratum smaller than k1 skips dead rounds; all-incoming stratum extends to nothing") {
    // membership of ids 0..999 under the 'inc:' scramble
    val inc = spark.range(1000).select(col("id"),
      (graft.operators.Relational.scrambleMod(graft.functions.TextHash
        .polyHash(concat(lit("inc:"), col("id").cast("string"))))
        % 5 === 0L).as("inc")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def writeIds(ids: Seq[Long], dir: String): Unit = {
      val rng = new java.util.Random(41L)
      ids.map(id => (id, Array.fill(8)(rng.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val (k1, k2) = (4, 6)
    // case 1: 2 existing + 3 incoming ids — day 1 exhausts at 2
    // centers, rounds 3..k1 are absent, extension numbers from k1+1
    val ex2 = inc.collect { case (id, false) => id }.toSeq.sorted.take(2)
    val in3 = inc.collect { case (id, true) => id }.toSeq.sorted.take(3)
    locally {
      val dir = java.nio.file.Files.createTempDirectory("incr1").toString
      try {
        writeIds(ex2 ++ in3, dir)
        val rounds = Similarity.coresetIncremental(spark, dir, k1, k2, 5)
          .collect().map(r => (r.getAs[Int]("sel_round"),
            r.getAs[Long]("is_new"))).toSeq.sorted
        assert(rounds.map(_._1) === Seq(1, 2, k1 + 1, k1 + 2),
          "dead rounds (|ex|+1..k1) must stay absent; extension starts at k1+1")
        assert(rounds.map(_._2) === Seq(0L, 0L, 1L, 1L))
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
    // case 2: every vector incoming — the day-1 artifact is empty and
    // the extension degrades to zero rows (the oracle's empty-seed
    // chain yields nothing at every round)
    locally {
      val dir = java.nio.file.Files.createTempDirectory("incr2").toString
      try {
        writeIds(in3, dir)
        assert(Similarity.coresetIncremental(spark, dir, k1, k2, 5)
          .collect().isEmpty)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
