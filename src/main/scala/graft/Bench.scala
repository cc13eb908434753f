package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed end-to-end at
  * local[32], one JSON line on stdout (BENCH_r{N} contract).
  *
  * Results are materialized through the `noop` DataSource V2 sink —
  * a plain `.count()` would let Catalyst prune the projections and
  * window expressions under test (a count over q1 collapses to a
  * parquet row-count scan), so noop-write is the honest measure of
  * operator throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen, parquet readers, noop sink) so the
    // first measured query doesn't absorb one-time init cost
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // session hygiene: a query's caches (spine, signatures) exist to
      // dedupe work WITHIN one query; left persisted they accumulate
      // across the 33-query session and the memory pressure inflates
      // late queries, so the bench would measure the harness, not the
      // operator. Drop them after the clock stops.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
