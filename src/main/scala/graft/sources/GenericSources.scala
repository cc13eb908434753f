package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic secondary sources/sinks (SURVEY §2.1): schema-enforced CSV
  * and JSON readers plus the parquet writer used by every fixture.
  *
  * Schemas are always passed explicitly — `inferSchema` triggers an
  * extra full pass over the data (a non-starter at 100 TB) and can
  * silently drift types between runs; a declared `StructType` keeps
  * the scan single-pass and the plan's `ReadSchema` exact. Reads stay
  * splittable (no multiLine), so a 1000-executor cluster partitions
  * the input by file blocks.
  */
object GenericSources {

  def readCsv(s: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not as nulls
      .csv(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }
}
