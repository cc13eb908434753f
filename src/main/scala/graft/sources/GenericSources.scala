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

  /** Q205 — line-oriented `text` source round-trip: the documents
    * table serialized as TAB-framed lines (`id\ttext` — the corpus
    * interchange format of most raw text dumps; testdata text is
    * newline/tab-free, asserted at write), written through the text
    * sink, re-ingested with `spark.read.text` + one codegen'd
    * substring split, and rolled up per length bucket. The rollup
    * equals the same aggregate over the original parquet (oracle
    * side), proving the line framing lossless — the ingest check a
    * raw-dump migration runs before trusting a .txt corpus drop.
    *
    * Scale shape: text read/write is splittable and narrow; the
    * parse is two string expressions in the scan projection; one
    * bounded aggregate.
    */
  def textRoundtripSummary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_text")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val framed = docs.select(
      concat(col("doc_id").cast("string"), lit("\t"), col("text")).as("value"))
    assert(docs.filter(col("text").contains("\n") ||
      col("text").contains("\t")).isEmpty,
      "text contains frame characters; escape before line framing")
    framed.write.mode("overwrite").text(out.toString)
    val parsed = s.read.text(out.toString)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        expr("substring(value, instr(value, '\t') + 1)").as("text"))
    val summary = parsed
      .groupBy((length(col("text")) % 7L).as("len_mod7"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_len"),
        sum(col("doc_id")).as("sum_ids"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .localCheckpoint() // materialize before the fixture dir vanishes
    deleteRecursively(out)
    summary
  }

  /** Q206 — `binaryFile` source ingest: media blobs landed as ONE
    * FILE PER BLOB (how image/audio corpora actually arrive on
    * object storage), read back through Spark's binaryFile source
    * (path, length, content), keyed by the filename stem, and
    * audited per length bucket with exact byte checksums. Checksums
    * equal the in-table byte sums (oracle side), proving the
    * file-per-blob ingest path byte-lossless end-to-end.
    *
    * Scale shape: binaryFile scans are file-parallel; the checksum
    * is computed in the scan projection (aggregate over the byte
    * array — codegen, no UDF); blobs never shuffle (the Q139
    * discipline) — only (id, length, checksum) rows reach the
    * aggregate. Fixture writes one file per doc via a single
    * foreachPartition pass.
    */
  def binaryFilesSummary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_bin")
    val outStr = out.toString
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .foreachPartition {
        (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outStr, s"${r.getLong(0)}.bin"),
              r.getAs[Array[Byte]]("media"))
          }
      }
    val summary = s.read.format("binaryFile").load(outStr)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length"),
        // ASCII fixture bytes: decode + per-char ascii sum stays in
        // codegen'd builtins (a real binary corpus would md5 at the
        // scan, the q139 discipline)
        aggregate(transform(split(col("content").cast("string"), ""),
            c => ascii(c).cast("long")),
          lit(0L), (acc, x) => acc + x).as("checksum"))
      .groupBy((col("length") % 5L).as("len_mod5"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("sum_bytes"),
        sum(col("checksum")).as("sum_checksum"),
        sum(col("doc_id")).as("sum_ids"))
      .localCheckpoint()
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
