package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q16 — similarity search over the `embeddings` table (64-dim float
  * vectors). Brute-force cosine top-k is the correctness baseline; the
  * LSH-bucketed variant (operators/Dedup.scala / AnnLsh) is the scale
  * path.
  *
  * Float elements are cast to double *before* any arithmetic, and the
  * dot/norm folds run in ascending element order from 0.0 — mirroring
  * the generated oracle SQL bitwise.
  */
object Similarity {

  def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Ascending-order fold of elementwise products (both args cast to
    * double upstream).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Q16 — top-k cosine neighbours of a fixed probe set (vec_id < 3),
    * excluding self; ties broken by vec_id for determinism.
    */
  def bruteForceTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"))
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("de").as("pe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes.crossJoin(e)
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("pe"), col("de")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "vec_id", "sim", "rnk")
  }
}
