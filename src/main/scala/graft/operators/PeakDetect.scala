package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.PeakConfig
import graft.functions.FindPeaks
import Smoothing.keyCols

/** O7/O8 — peak detection (SURVEY §2.5).
  *
  * Declarative parts (rule-1 candidates, amplitude gate) are window
  * expressions; the sequential parts of scipy's `find_peaks` (greedy
  * distance, wlen-clipped prominence, interpolated width) run as a
  * faithful typed port inside `groupByKey(channel).flatMapGroups` — a
  * channel is one bounded recording, and 100 TB scale comes from
  * millions of independent channels, which is exactly flatMapGroups'
  * parallelism (no driver-side work, no broadcast of signal data).
  */
object PeakDetect {

  /** Input row of the typed per-channel pass. */
  final case class ChannelRow(
      experiment_id: String,
      channel: Int,
      sample_idx: Long,
      t: Double,
      y_smooth: Double,
      baseline: Option[Double],
      ceiling: Option[Double]
  )

  /** Detected peak (pre-metrics). */
  final case class DetectedPeak(
      experiment_id: String,
      channel: Int,
      peak_idx: Long,
      t: Double,
      peak_value: Double
  )

  private def keys: Seq[Column] = keyCols.map(col)

  /** Rule-1 candidates as a declarative query: strict local maxima of
    * the smooth series (Q5). The exact plateau-midpoint rule lives in
    * [[graft.functions.FindPeaks.localMaxima]]; tied neighbours cannot
    * occur on continuous signals, where the two coincide.
    */
  def candidates(smoothed: DataFrame): DataFrame = {
    val wo = Window.partitionBy(keys: _*).orderBy("sample_idx")
    val v = col("y_smooth")
    smoothed
      .withColumn("_isMax",
        v > lag(v, 1).over(wo) && v > lead(v, 1).over(wo))
      .filter(col("_isMax"))
      .drop("_isMax")
  }

  /** Amplitude gate (Q6): keep a candidate unless
    * `smooth < (ceiling − baseline)·threshold + baseline`
    * (`/root/reference/peak_detection.py:255-260`). A NaN envelope makes
    * the Python comparison False — i.e. the peak is KEPT — so null
    * envelopes keep here too.
    */
  def gateCondition(cfg: PeakConfig = PeakConfig()): Column = {
    val b = col("baseline"); val c = col("ceiling"); val v = col("y_smooth")
    b.isNull || c.isNull || v >= (c - b) * lit(cfg.threshold) + b
  }

  def gated(enriched: DataFrame, cfg: PeakConfig = PeakConfig()): DataFrame =
    candidates(enriched).filter(gateCondition(cfg))

  /** Full O7: scipy-parity find_peaks + amplitude gate, one bounded
    * channel at a time. Emits one row per detected peak.
    */
  def detectPeaks(
      enriched: DataFrame,
      cfg: PeakConfig = PeakConfig()
  ): Dataset[DetectedPeak] = {
    val spark = enriched.sparkSession
    import spark.implicits._
    enriched
      .select(col("experiment_id"), col("channel"), col("sample_idx"),
        col("t"), col("y_smooth"), col("baseline"), col("ceiling"))
      .as[ChannelRow]
      .groupByKey(r => (r.experiment_id, r.channel))
      .flatMapGroups { (_: (String, Int), it: Iterator[ChannelRow]) =>
        val rows = it.toArray.sortBy(_.sample_idx)
        val x = rows.map(_.y_smooth)
        FindPeaks
          .findPeaks(x, cfg.width, cfg.minDistance, cfg.relHeight,
            cfg.prominence, cfg.wlen)
          .iterator
          .filter { p =>
            // gate with Python NaN-comparison parity: null envelope keeps
            (rows(p).baseline, rows(p).ceiling) match {
              case (Some(b), Some(c)) => !(x(p) < (c - b) * cfg.threshold + b)
              case _ => true
            }
          }
          .map { p =>
            DetectedPeak(rows(p).experiment_id, rows(p).channel,
              rows(p).sample_idx, rows(p).t, x(p))
          }
      }
  }

  /** Q7a — prominence (wlen-clipped) of every rule-1 candidate, before
    * the distance filter. Pure per-channel computation, emitted as rows.
    */
  def candidateProminences(
      smoothed: DataFrame,
      cfg: PeakConfig = PeakConfig()
  ): DataFrame = {
    val spark = smoothed.sparkSession
    import spark.implicits._
    smoothed
      .select(col("experiment_id"), col("channel"), col("sample_idx"),
        col("t"), col("y_smooth"), lit(null).cast("double").as("baseline"),
        lit(null).cast("double").as("ceiling"))
      .as[ChannelRow]
      .groupByKey(r => (r.experiment_id, r.channel))
      .flatMapGroups { (key: (String, Int), it: Iterator[ChannelRow]) =>
        val rows = it.toArray.sortBy(_.sample_idx)
        val x = rows.map(_.y_smooth)
        val peaks = FindPeaks.localMaxima(x)
        val proms = FindPeaks.peakProminences(x, peaks, cfg.wlen)
        peaks.iterator.zip(proms.iterator).map { case (p, pr) =>
          (key._1, key._2, rows(p).sample_idx, pr.value)
        }
      }
      .toDF("experiment_id", "channel", "peak_idx", "prominence")
  }

  /** O2 — stim rescale: per-channel scale to the signal's amplitude,
    * `stim.y · (max(sig.y) / max(stim.y))`
    * (`/root/reference/peak_detection.py:27-29`; immutable output —
    * SURVEY §8 Q1).
    */
  def rescaleStim(sig: DataFrame, stim: DataFrame): DataFrame = {
    val wch = Window.partitionBy(keys: _*)
    val sigMax = sig.groupBy(keyCols.map(col): _*)
      .agg(max("y").as("_sigmax"))
    stim
      .withColumn("_stmax", max(col("y")).over(wch))
      .join(sigMax, keyCols)
      .withColumn("y_scaled", col("y") * (col("_sigmax") / col("_stmax")))
      .drop("_sigmax", "_stmax")
  }

  /** O8 — stim peaks: bare `find_peaks(stim)` = rule-1 local maxima
    * only (`/root/reference/peak_detection.py:296`; the six accepted
    * params are dead code).
    */
  def stimPeaks(rescaled: DataFrame): DataFrame = {
    val wo = Window.partitionBy(keys: _*).orderBy("sample_idx")
    val v = col("y_scaled")
    rescaled
      .withColumn("_isMax",
        v > lag(v, 1).over(wo) && v > lead(v, 1).over(wo))
      .filter(col("_isMax"))
      .select(col("experiment_id"), col("channel"), col("sample_idx"),
        col("y_scaled"))
  }
}
