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

  test("lshBucket: identical vectors share a bucket; negation flips every bit") {
    val planes = Similarity.hyperplanes()
    val v = randVecs(1).head.map(_.toDouble)
    val df = Seq((0L, v), (1L, v), (2L, v.map(-_)))
      .toDF("vec_id", "de")
      .withColumn("b", Similarity.lshBucket($"de", planes))
    val bs = df.orderBy("vec_id").collect().map(_.getAs[Long]("b"))
    assert(bs(0) === bs(1))
    assert(bs(2) === (~bs(0) & 0x3fL))
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
}
