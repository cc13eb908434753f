package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** doc_id + distinct 3-word shingle hashes (`h` in [0, P)) — one
    * native tokenize+hash+shingle pass per document
    * (ShingleHashesExpr), then explode + distinct.
    */
  def shingleHashes(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(TextHash.shingleHashes(col("text"))).as("h"))
      .distinct()

  /** MinHash signatures, one row per doc with 16 columns mh1..mh16 —
    * all permuted minima computed in a single hash aggregate over the
    * shingle table (columnar: no 16× row blow-up, one shuffle on
    * doc_id; partial aggregation halves the exchange).
    */
  def minhashSignatures(s: SparkSession, d: DataFrame): DataFrame = {
    val params = TextHash.minhashParams()
    val aggs = params.map { case (i, _, a, b) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"mh$i")
    }
    shingleHashes(d).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Ordered fold of one band's signature columns into a single key
    * (same arithmetic as the oracle's list_reduce).
    */
  private def bandKey(his: Seq[Int]): Column =
    his.foldLeft(lit(0L): Column)((acc, i) =>
      pmod(acc * lit(31L) + col(s"mh$i"), lit(P)))

  /** Q15c — MinHash+LSH near-dup candidate pairs with the estimated
    * Jaccard (fraction of the 16 signature slots that agree). A pair
    * is a candidate iff it collides in at least one of the 4 bands;
    * the band table is unpivoted with `stack` so the self-join
    * shuffles on (band, band-key) only.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val params = TextHash.minhashParams()
    val sig = minhashSignatures(s, docs(s, dir)).cache()
    val byBand = params.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (band, ps) => band -> ps.map(_._1) }
    val stackArgs = byBand
      .map { case (band, his) => Seq(lit(band), bandKey(his)) }
    val bands = sig.select(col("doc_id"),
      explode(array(stackArgs.map(p => struct(p(0).as("band"), p(1).as("bh"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val matches = params
      .map { case (i, _, _, _) =>
        when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0): Column }
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / lit(16.0)).as("est_jaccard"))
  }

  /** 32-bit SimHash per document: token-count-weighted bit votes over
    * the 32-bit polynomial token hash. All 32 bit-sums are columns of
    * one hash aggregate (no 32× bit explode).
    */
  def simhashSignatures(s: SparkSession, d: DataFrame): DataFrame = {
    val tok = d
      .select(col("doc_id"), explode(TextHash.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        TextHash.polyHash(col("tok"), mod = TextHash.M32).as("h32"))
    val bitSums = (0 until 32).map { j =>
      sum(col("cnt") *
        (expr(s"shiftright(h32, $j) & 1") * lit(2L) - lit(1L))).as(s"bs$j")
    }
    val simhash = (0 until 32)
      .map(j => when(col(s"bs$j") > 0, lit(1L << j)).otherwise(0L): Column)
      .reduce(_ + _)
    tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
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
