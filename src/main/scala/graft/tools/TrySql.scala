package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SQL statement against the sf0.001 tables and
  * print a few rows + the plan. Usage: TrySql "<sql>"
  */
object TrySql {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tname =>
      spark.read.parquet(s"$dir/$tname.parquet").createOrReplaceTempView(tname)
    }
    val df = spark.sql(args(0))
    df.show(10, truncate = false)
    df.explain("formatted")
  }
}
