package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SavitzkyGolay

/** O3 — Savitzky-Golay smoothing with the reference's block-repeat edge
  * padding (`/root/reference/peak_detection.py:172-197`, SURVEY §2.3).
  *
  * Spark-first design: the pad is three narrow projections unioned
  * (positions never collide), the 51-tap FIR is one window expression
  * over `(experiment_id, channel) ORDER BY pos` — every downstream
  * operator shares that partitioning, so Catalyst plans a single
  * Exchange+Sort for the whole signal pipeline. No UDF, no RDD.
  */
object Smoothing {

  val keyCols: Seq[String] = Seq("experiment_id", "channel")
  private def keys: Seq[Column] = keyCols.map(col)

  /** Left-assoc FIR dot product: ((0.0 + c₀·x₀) + c₁·x₁) + … — the exact
    * association order is mirrored in the generated DuckDB oracle SQL so
    * both engines produce bitwise-identical doubles.
    */
  def sgDot(taps: Column, coeffs: Array[Double]): Column =
    aggregate(
      zip_with(taps, typedLit(coeffs), (a, b) => a * b),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** Block-repeat pad of a per-channel series `valueCol` ordered by
    * `idxCol` (dense 0-based, per-channel length in `nCol`):
    * concat(v[0:pad], v, v[m-pad:m]) laid out at positions
    * [0,pad) ∪ [pad,m+pad) ∪ [m+pad,m+2·pad). NOT mirror, NOT
    * edge-replicate — duplicated blocks keep original order
    * (`/root/reference/peak_detection.py:188-189`).
    * Extra columns survive on the body rows (pads carry copies).
    */
  def blockRepeatPad(df: DataFrame, idxCol: String, nCol: String, pad: Int): DataFrame = {
    val pre = df.filter(col(idxCol) < pad)
      .withColumn("_pos", col(idxCol))
    val body = df.withColumn("_pos", col(idxCol) + pad)
    val post = df.filter(col(idxCol) >= col(nCol) - pad)
      .withColumn("_pos", col(idxCol) + 2 * pad)
    pre.unionByName(body).unionByName(post)
  }

  /** `mode='nearest'` edge handling for the SG convolution: extend the
    * padded series with `k` replicas of its first/last value so every
    * evaluated position has a full window (scipy pads the input with the
    * edge value; clamping tap indices ≡ replicating edge rows). Series is
    * at `_pos` in [0, len); `lenCol` gives per-channel length.
    */
  def nearestExtend(padded: DataFrame, valueCol: String, lenCol: String, k: Int): DataFrame = {
    val left = padded.filter(col("_pos") === 0)
      .withColumn("_pos", explode(sequence(lit(-k), lit(-1))))
    val right = padded.filter(col("_pos") === col(lenCol) - 1)
      .withColumn("_pos", explode(sequence(col(lenCol), col(lenCol) + k - 1)))
    padded.unionByName(left).unionByName(right)
  }

  /** Adds `y_smooth` (SG window/polyorder over block-repeat-padded `y`,
    * pad stripped) to the signal frame. Output length = input length;
    * interior samples equal the plain SG convolution, edge samples see
    * the duplicated block — exact reference parity (SURVEY §2.3).
    *
    * For the retained output range the padded-array windows never
    * overrun (positions k..n+k-1 of an (n+2k)-long series), so scipy's
    * `mode='nearest'` branch is unreachable here — no edge extension.
    */
  def withSmooth(sig: DataFrame, window: Int = 51, polyorder: Int = 7): DataFrame = {
    val k = window / 2
    val c = SavitzkyGolay.coeffs(window, polyorder)
    val wch = Window.partitionBy(keys: _*)
    val wtap = Window.partitionBy(keys: _*).orderBy("_pos").rowsBetween(-k, k)

    val wn = sig.withColumn("_n", count(lit(1)).over(wch))
    val padded = blockRepeatPad(wn, "sample_idx", "_n", k)
    padded
      .withColumn("_taps", collect_list(col("y")).over(wtap))
      .filter(col("_pos") >= k && col("_pos") < col("_n") + k)
      .withColumn("y_smooth",
        when(size(col("_taps")) === window, sgDot(col("_taps"), c)))
      .drop("_taps", "_pos", "_n")
  }
}
