package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q14/Q15 — text analytics and deduplication over the `documents`
  * table (extended with the LLM-pipeline operator family in
  * operators/Dedup.scala).
  *
  * Scale notes: tokenization is a narrow explode (no shuffle until the
  * aggregate); dedup blocks shuffle on the block key — the standard
  * blocking pattern for near-dup candidate generation at 100 TB.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Q14 — token statistics: per lowercase whitespace token, total
    * occurrences and document frequency.
    */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** Q15 — exact dedup: group identical texts, keep the minimum doc_id
    * as survivor.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Q15b — near-dup candidate pairs via (length, 32-char lowercase
    * prefix) blocking: classic candidate generation — the self-join
    * shuffles on the block key only.
    */
  def nearDupCandidates(s: SparkSession, dir: String): DataFrame = {
    val b = docs(s, dir).select(col("doc_id"), col("n_chars"),
      substring(lower(col("text")), 1, 32).as("pfx"))
    val a = b.as("a"); val c = b.as("b")
    a.join(c,
        col("a.n_chars") === col("b.n_chars") &&
        col("a.pfx") === col("b.pfx") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }
}
