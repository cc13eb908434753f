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
    * double upstream). Native DotProductExpr — bitwise-identical to
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` but a tight codegen'd
    * loop instead of per-element lambda interpretation.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.DotProductExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(b)))

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

  // ---- scale-path variants: LSH bucketing and IVF-style ANN ----

  /** Deterministic random-hyperplane matrix (LCG over the flattened
    * (plane, dim) index) — literal in both engines, so bucket
    * assignment is oracle-replicable bit for bit.
    */
  def hyperplanes(nPlanes: Int = 6, dim: Int = 64): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      ((1103515245L * (p * dim + d) + 12345L) % 2147483648L) / 2147483648.0 - 0.5
    }

  /** Fold of coeffs·v in ascending element order from 0.0 — the shared
    * association-order convention.
    */
  private def dotLit(coeffs: Array[Double], v: Column): Column =
    dot(lit(coeffs), v)

  /** Sign-of-projection bucket id: bit p set iff plane_p · v >= 0. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (pl, i) =>
      when(dotLit(pl, v) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Q16b — LSH-bucketed cosine near-dup pairs: candidate pairs only
    * within a 6-plane sign bucket (64 buckets ⇒ the self-join input is
    * ~n²/64 instead of n²; at 100 TB the bucket is the shuffle key and
    * more planes shrink buckets further), then exact cosine >= minSim.
    * Approximate by design: cross-bucket pairs are unseen — the oracle
    * replicates the same bucketing, so the contract is exact.
    */
  def lshNearDup(s: SparkSession, dir: String, minSim: Double = 0.35): DataFrame = {
    val planes = hyperplanes()
    val e = embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"))
      .withColumn("bucket", lshBucket(col("de"), planes))
    e.as("x").join(e.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("sim", cosine(col("x.de"), col("y.de")))
      .filter(col("sim") >= minSim)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), col("sim"))
  }

  /** Q16c — IVF-style ANN: vectors are partitioned by nearest centroid
    * (fixed coarse quantizer: the vec_id < nCentroids vectors), probes
    * search only their nProbe nearest inverted lists. The centroid
    * table is broadcast; the scan touches nProbe/nCentroids of the
    * corpus — the standard IVF trade, expressed as two broadcast joins
    * plus a per-probe top-k window.
    */
  def ivfTopK(s: SparkSession, dir: String, nCentroids: Int = 8,
              nProbe: Int = 2, k: Int = 5): DataFrame = {
    val e = embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("de"))
    val cent = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("de").as("ce"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("csim", cosine(col("de"), col("ce")))
      .withColumn("crk", row_number().over(wAssign))
    val lists = assigned.filter(col("crk") === 1)
      .select(col("vec_id"), col("de"), col("cid").as("list_id"))
    val probeLists = assigned.filter(col("vec_id") < 3 && col("crk") <= nProbe)
      .select(col("vec_id").as("probe_id"), col("de").as("pe"),
        col("cid").as("list_id"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    probeLists.join(lists, "list_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("pe"), col("de")))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select("probe_id", "vec_id", "sim", "rnk")
  }
}
