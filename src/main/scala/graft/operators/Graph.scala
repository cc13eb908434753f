package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on relational edges (see also
  * [[Dedup.connectedComponents]] for min-label propagation).
  */
object Graph {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Q79 — PageRank over the customer↔supplier purchase graph
    * (bipartite, made undirected so every node has out-degree ≥ 1 and
    * no rank mass dangles). Fixed `iters` power iterations of
    * r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/deg(u).
    *
    * Float discipline: the per-target Σ of contributions is a
    * shuffle-order-dependent double sum in the naive form, so each
    * contribution r(u)/deg(u) is quantized to DECIMAL(28,14) and
    * summed exactly (any combine order), then finished in one pinned
    * double expression per iteration — the oracle unrolls the same
    * iterations with the same arithmetic, so ranks are bitwise-stable
    * across engines and runs.
    *
    * Scale shape: one edge-keyed shuffle per iteration (join rank on
    * src, aggregate on dst) — the canonical Pregel-on-relational
    * plan; edges cached across iterations; N and the teleport term
    * are scalars. node = 2·custkey / 2·suppkey+1 keeps the two key
    * spaces disjoint.
    */
  def pageRank(s: SparkSession, dir: String, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = cs.unionAll(cs.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")).cache()
    val n = deg.count()
    var rank = deg.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = edges.join(rank, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      rank = deg.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("deg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("sc").cast("double"), lit(0.0)))
            .as("rank"))
    }
    rank.select(col("node"), col("rank"))
  }
}
