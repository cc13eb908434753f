package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: attribute the graph family's task CPU to its component
  * stages (guide §1 — measure first). Times, via noop sink + TaskCpuMeter:
  * the lineitem scan, the distinct (o,p) projection, the co-purchase
  * support aggregate, and the degree/orientation pass — the shared
  * prefix of q79/q113/q126/q130/q143/q159/q163/q179/q183/q217/q223/q226.
  *
  *   sbt "runMain graft.tools.ProfileGraph /root/testdata/sf0.1"
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val meter = org.apache.spark.graftshim.TaskCpuMeter.attach(spark.sparkContext)
    def time(label: String)(df: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val k0 = meter.snapshotNs(); val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val c = (meter.snapshotNs() - k0) / 1e9
        println(f"[profile] $label run$i: wall $dt%.2f s cpu $c%.2f s")
        spark.catalog.clearCache()
      }
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("lineitem (o,p) scan")(li.select(col("l_orderkey"), col("l_partkey")))
    val lp = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    time("distinct (o,p)")(lp)
    time("per-order pair self-join (no agg)")(
      lp.as("x").join(lp.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b")))
    val edges = lp.as("x").join(lp.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("a"), col("b"))
    time("copurchaseEdges (join form)")(edges)
    val agg = lp.groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          b => struct(a.as("a"), b.as("b")))))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("a"), col("b"))
    time("copurchaseEdges (aggregate form)")(agg)
    // aggregate form straight off the scan (no pre-distinct: collect_set
    // dedupes in the aggregation buffer)
    val agg2 = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          b => struct(a.as("a"), b.as("b")))))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("a"), col("b"))
    time("copurchaseEdges (agg, no pre-distinct)")(agg2)
    // q79's edge derivation: orders x lineitem distinct pair
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val cs = o.join(li.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    time("q79 edge derivation (orders⋈lineitem distinct)")(cs)
    // q79 one decimal iteration cost proxy: contributions summed by dst
    val edges79 = cs.unionAll(cs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges79.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val rank = deg.withColumn("rank", lit(1.0 / 20000))
    time("q79 one iteration, decimal(28,14) sum")(
      edges79.join(broadcast(rank), col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).cast("decimal(28,14)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc")))
    time("q79 one iteration, decimal(18,14) sum")(
      edges79.join(broadcast(rank), col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).cast("decimal(18,14)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc")))
    spark.stop()
  }
}
