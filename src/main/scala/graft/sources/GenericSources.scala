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

  /** ORC writer — the second columnar format Spark ships natively.
    * Same splittable/predicate-pushdown properties as parquet (ORC
    * carries stripe-level min/max indexes Spark's reader prunes with),
    * so a 100 TB corpus stored either way scans the same shape.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Q59 — ORC round-trip audit: the documents table written to ORC,
    * read back through the ORC scan, and summarized per (source,
    * lang). The aggregate equals the same rollup over the original
    * parquet bits (the oracle's side), so the round-trip is proven
    * lossless column-for-column on every row — the check a format
    * migration at scale runs before swapping readers. The summary keys
    * on small group cardinality; one shuffle.
    */
  def orcRoundtripSummary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_orc")
    writeOrc(s.read.parquet(s"$dir/documents.parquet"), out.toString)
    val summary = readOrc(s, out.toString)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(length(col("text")).cast("long")).as("sum_text_len"))
      .localCheckpoint() // materialize before the fixture dir vanishes
    deleteRecursively(out)
    summary
  }

  /** Q119 — partitioned-sink + partition-pruning audit: the documents
    * table written as a hive-layout parquet tree partitioned by
    * `source` (the layout a 100 TB corpus actually lands in), read
    * back with a partition-key filter, and summarized per lang. The
    * filter prunes at the DIRECTORY level — the scan plans only the
    * matching partition's files (`PartitionFilters` in the physical
    * plan, pinned by PlanQualitySpec), so the read does work
    * proportional to one partition, not the corpus: the difference
    * between touching 1/N of 100 TB and all of it. The aggregate
    * equals the same rollup over the original table filtered
    * declaratively (the oracle side), proving the partitioned
    * round-trip lossless AND the pruned read complete.
    *
    * The partition column comes back from the directory name, not the
    * data files; `basePath`-free single-root read keeps the schema
    * identical. Temp tree deleted after materialization (q59 shape).
    */
  def partitionedRoundtripSummary(s: SparkSession, dir: String,
                                  source: String = "src3"): DataFrame = {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_part")
    writeParquet(s.read.parquet(s"$dir/documents.parquet"), out.toString,
      partitionBy = Seq("source"))
    val summary = s.read.parquet(out.toString)
      .filter(col("source") === source)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(length(col("text")).cast("long")).as("sum_text_len"))
      .localCheckpoint() // materialize before the fixture dir vanishes
    deleteRecursively(out)
    summary
  }

  /** The join+rollup half of [[dppRollup]], parameterized on the two
    * written dirs so PlanQualitySpec can pin the EXACT plan the
    * registered query executes (the registered form checkpoints and
    * deletes its temp tree, which erases the plan).
    *
    * The dim filter (`min_doc % 2 = 0` — doc-count parity is
    * degenerate on the uniform test corpus, min-doc parity splits the
    * sources 10/10 at every SF) is on an attribute that only
    * exists in the dim FILE — it cannot be rewritten statically onto
    * the fact's partition column, so pruning the fact scan requires
    * the runtime mechanism: Catalyst's PartitionPruning inserts a
    * `dynamicpruning` subquery that evaluates the broadcast dim side
    * first and feeds the surviving `source` values to the fact scan's
    * partition filter. At 100 TB this is the difference between
    * listing/reading the ~half of the partition directories the dim
    * selects and scanning all of them to throw half away at the join.
    */
  private[graft] def dppRollupFrom(s: SparkSession, factDir: String,
                                   dimDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val fact = s.read.parquet(factDir)
    val dim = s.read.parquet(dimDir).filter(col("min_doc") % 2 === 0)
    // broadcast keeps the dim reusable as the DPP filter input
    fact.join(broadcast(dim.select(col("source"))), Seq("source"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** Q170 — dynamic-partition-pruning audit: the documents table
    * written as a source-partitioned parquet tree (the q119 layout)
    * plus a per-source profile table (doc counts), then joined —
    * fact ⋈ dim filtered on a dim-only attribute — and rolled up per
    * (source, lang). Static pruning cannot fire (the predicate is on
    * the dim's `n_docs`, unknowable from the fact side), so the scan
    * is pruned at RUNTIME via the DPP subquery; equality with the
    * declarative oracle over the original table proves the pruned
    * read complete. See [[dppRollupFrom]] for the mechanism.
    */
  def dppRollup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_dppq")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    writeParquet(docs, s"$out/fact", partitionBy = Seq("source"))
    writeParquet(
      docs.groupBy(col("source")).agg(min(col("doc_id")).as("min_doc")),
      s"$out/dim")
    val summary = dppRollupFrom(s, s"$out/fact", s"$out/dim")
      .localCheckpoint() // materialize before the fixture dir vanishes
    deleteRecursively(out)
    summary
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally stream.close()
    }
  }
}
