package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry
  * query and time its noop-write execution.
  *
  *   sbt "runMain graft.tools.Explain q15c_minhash_lsh /root/testdata/sf0.01"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
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
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name first run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name warm run:  ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
