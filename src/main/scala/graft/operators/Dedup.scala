package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** LLM-pipeline deduplication family over the `documents` table:
  * MinHash+LSH, SimHash, and exact n-gram Jaccard. These extend the
  * reference's exact-dedup surface (SURVEY §2.9 Q15) with the
  * approximate near-dup operators a 100 TB training-data pipeline
  * needs.
  *
  * Scale design, common to all three:
  *  - per-document work (tokenize → shingle → hash → signature) is a
  *    narrow projection over codegen'd higher-order array functions —
  *    no shuffle, no UDF, no driver participation;
  *  - candidate generation shuffles ONLY on the small blocking key
  *    (band hash / signature byte / shingle), never all-pairs: the
  *    classic band-join keeps the join input linear in corpus size;
  *  - the tiny permutation-parameter table is broadcast (16 rows).
  *
  * Hash arithmetic is oracle-replicable by construction — see
  * functions/TextHash.scala.
  */
object Dedup {

  import TextHash.P

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** doc_id + distinct 3-word shingle hashes (`h` in [0, P)). */
  def shingleHashes(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(TextHash.wordShingles(TextHash.tokens(col("text")))).as("sh"))
      .select(col("doc_id"), TextHash.polyHash(col("sh")).as("h"))
      .distinct()

  /** MinHash signatures: one row per (doc_id, hash index) with the
    * permuted minimum. numHashes=16 permutations in 4 bands of 4.
    */
  def minhashSignatures(s: SparkSession, d: DataFrame): DataFrame = {
    val params = s.createDataFrame(TextHash.minhashParams())
      .toDF("hi", "band", "ha", "hb")
    shingleHashes(d)
      .crossJoin(broadcast(params))
      .groupBy(col("doc_id"), col("hi"), col("band"))
      .agg(min(pmod(col("ha") * col("h") + col("hb"), lit(P))).as("mh"))
  }

  /** Q15c — MinHash+LSH near-dup candidate pairs with the estimated
    * Jaccard (fraction of the 16 signature slots that agree). A pair
    * is a candidate iff it collides in at least one of the 4 bands.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(s, docs(s, dir)).cache()
    // band key: ordered fold of the band's 4 signature values.
    val bands = sig
      .groupBy(col("doc_id"), col("band"))
      .agg(sort_array(collect_list(struct(col("hi"), col("mh")))).as("sl"))
      .select(col("doc_id"), col("band"),
        aggregate(col("sl"), lit(0L),
          (acc, x) => pmod(acc * lit(31L) + x.getField("mh"), lit(P))).as("bh"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.hi") === col("sb.hi"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("sa.mh") === col("sb.mh"), 1).otherwise(0))
        .cast("double") / lit(16.0)).as("est_jaccard"))
  }

  /** 32-bit SimHash per document: token-count-weighted bit votes over
    * the 32-bit polynomial token hash.
    */
  def simhashSignatures(s: SparkSession, d: DataFrame): DataFrame = {
    val tok = d
      .select(col("doc_id"), explode(TextHash.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        TextHash.polyHash(col("tok"), mod = TextHash.M32).as("h32"))
    tok
      .select(col("doc_id"), col("cnt"), col("h32"),
        explode(sequence(lit(0), lit(31))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("cnt") *
        (expr("shiftright(h32, j) & 1") * lit(2L) - lit(1L))).as("bs"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("bs") > 0, expr("shiftleft(1L, j)")).otherwise(0L))
        .as("simhash"))
  }

  /** Q15d — SimHash near-dup pairs: block on any of the 4 signature
    * bytes, keep pairs within the Hamming radius.
    */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 2): DataFrame = {
    val sig = simhashSignatures(s, docs(s, dir)).cache()
    val blocks = sig.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bk", expr("shiftright(simhash, b * 8) & 255"))
    val cand = blocks.as("x").join(blocks.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.simhash").as("sa"),
        col("y.doc_id").as("doc_b"), col("y.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Q15e — exact n-gram Jaccard: shingle-join candidate pairs (the
    * shuffle key is the shingle hash, linear in corpus size), exact
    * |A∩B| / |A∪B|, threshold 0.5.
    */
  def ngramJaccard(s: SparkSession, dir: String, minJaccard: Double = 0.5): DataFrame = {
    val sh = shingleHashes(docs(s, dir)).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }
}
