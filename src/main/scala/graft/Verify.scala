package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev-only: optional 3rd arg = comma-separated query-name filter
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json FIRST (round-7 lesson): it depends only on
    // SparkEntry.oracleSql, and writing it after all query dumps meant
    // any driver-side timeout/OOM mid-loop left nothing to parse and
    // zeroed the whole round's correctness artifact to {}. Written up
    // front, a truncated run still yields a partial — never empty —
    // compare set from whatever dumps completed.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val total = todo.size
    var i = 0
    todo.foreach { case (name, fn) =>
      i += 1
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // row count from the written footer metadata, not a recompute
        val n = spark.read.parquet(s"$outDir/$name").count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[verify] $i%3d/$total $name ok ($n rows, $dt%.1fs)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $i/$total $name failed: ${e.getMessage}")
      }
      // same session hygiene as Bench: per-query caches are intra-query
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
