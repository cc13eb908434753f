package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time named SparkEntry queries N times in one JVM to
  * separate steady-state operator cost from cold-start (codegen,
  * parquet footer reads, JIT). Mirrors Bench's session config and
  * per-iteration cache hygiene.
  *
  * Usage: TimeQuery <sfDir> <n> <name>[,<name>...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val meter = org.apache.spark.graftshim.TaskCpuMeter.attach(
      spark.sparkContext)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // wall/cpu pairs per iteration — cpu is executor task CPU (the
      // host-noise-immune number; see Bench/TaskCpuMeter scaladoc)
      val ts = (1 to n).map { _ =>
        val k0 = meter.snapshotNs()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        // match Bench's hygiene: unload streaming state-store residue
        try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, (meter.snapshotNs() - k0) / 1e9)
      }
      println(f"[time] $name: ${ts.map { case (t, c) => f"$t%.2f/$c%.2fcpu" }.mkString(" ")} s")
    }
    spark.stop()
  }
}
