package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text hashing shared by the dedup/fingerprint family
  * (operators/Dedup.scala, operators/TextAnalysis.scala).
  *
  * Everything here is chosen to be *oracle-replicable*: a polynomial
  * fold over character codes with the modulus applied at every step,
  * so the identical arithmetic can be written in DuckDB
  * (`list_reduce(list_prepend(0, list_transform(string_split(s,''),
  * c -> ascii(c))), (a,x) -> (a*31+x) % p)`) and both engines produce
  * the same 64-bit integers. Spark's own `xxhash64` would be faster
  * but has no DuckDB twin, and hash parity IS the correctness gate.
  * At 100 TB the fold is still a narrow per-row projection (no
  * shuffle, codegen'd higher-order functions), so the scale story is
  * unchanged.
  */
object TextHash {

  /** 2^31-1-ish prime used for shingle/minhash arithmetic. */
  val P: Long = 1000000007L

  /** 2^32 — modulus for the 32-bit token hash behind SimHash. */
  val M32: Long = 4294967296L

  /** Polynomial rolling hash of a string column: fold over character
    * codes, `acc = (acc*base + codepoint) % mod`, starting at 0.
    * Backed by the native PolyHashExpr (HashExpressions.scala) — the
    * equivalent `aggregate(transform(split(s,''), ascii), ...)` HOF
    * chain is ~100× slower per row and was the MinHash bottleneck.
    */
  def polyHash(s: Column, base: Long = 31L, mod: Long = P): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      PolyHashExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(s), base, mod))

  /** All k-gram base-`base` hashes of a string as one array column
    * (no mod; exact in Long for k*log2(base*cp) < 63).
    */
  def gramHashes(s: Column, k: Int, base: Long = 31L): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      GramHashesExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(s), k, base))

  /** Distinct sliding-window minima of an array<long> column (window
    * w, trailing windows truncated) — the native winnowing selection
    * behind q20's fingerprints (WinnowMinsExpr).
    */
  def winnowMins(a: Column, w: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      WinnowMinsExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a), w))

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** n-word shingles joined by single spaces, from a token array.
    * Empty array when the document has fewer than n tokens.
    */
  def wordShingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    ).otherwise(array().cast("array<string>"))

  /** Native one-pass equivalent of `wordShingles(tokens(text), n)` —
    * tokenizes and joins in a single scan (WordShinglesExpr), for the
    * q53-style paths where the shingle STRINGS are the output.
    */
  def wordShinglesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      WordShinglesExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text), n))

  /** Per-bigram (bh, wh) hash-pair structs in one native pass — the
    * q57 hot path without bigram-string materialization; arithmetic
    * identical to polyHash over the joined "w1 w2" string.
    */
  def bigramHashPairs(text: Column, base: Long = 31L, mod: Long = P): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      BigramHashPairsExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text), base, mod))

  /** All 3-token shingle hashes of a text column in one native pass —
    * see ShingleHashesExpr for why the compositional
    * transform/element_at form is quadratic and this isn't.
    */
  def shingleHashes(text: Column): Column = spanHashes(text, 3)

  /** All n-token span hashes of a text column (the generalized
    * shingle pass): per-token polyHash, left-assoc window combine.
    * n=8 is the q109 duplicated-span unit.
    */
  def spanHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      ShingleHashesExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text), n, 31L, P))

  /** MinHash permutation parameters: (index 1..k, band, a, b) with
    * a, b < P derived from fixed multiplicative constants — literal in
    * both engines (OracleSql emits the same numbers).
    */
  def minhashParams(numHashes: Int = 16, rowsPerBand: Int = 4): Seq[(Int, Int, Long, Long)] =
    (1 to numHashes).map { i =>
      val a = (2654435761L * i) % P match { case 0 => 1L; case x => x }
      val b = (40503L * 65537L * i + 17L) % P
      (i, (i - 1) / rowsPerBand, a, b)
    }
}
