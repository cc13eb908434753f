package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Smoothing
import graft.functions.SavitzkyGolay

/** Dev tool: attribute the signal-spine task CPU (guide §1) — smooth,
  * valley/peak marking, the 348-frame sliding min/max, the 301-tap
  * windowed convolution, and the final join — on the committed fixture.
  *
  *   sbt "runMain graft.tools.ProfileSpine"
  */
object ProfileSpine {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val meter = org.apache.spark.graftshim.TaskCpuMeter.attach(spark.sparkContext)
    def time(label: String)(df: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val k0 = meter.snapshotNs(); val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val c = (meter.snapshotNs() - k0) / 1e9
        println(f"[spine] $label run$i: wall $dt%.2f s cpu $c%.2f s")
        spark.catalog.clearCache()
      }
    }
    val sig = graft.sources.SignalFixture.signal(spark)
    time("raw fixture scan")(sig)
    val sm = Smoothing.withSmooth(sig)
    time("withSmooth (51-tap)")(sm)
    val keys = Seq(col("experiment_id"), col("channel"))
    val wch = Window.partitionBy(keys: _*)
    val wo = Window.partitionBy(keys: _*).orderBy("sample_idx")
    val wfr = wo.rowsBetween(1, 348)
    val v = col("y_smooth")
    val marked = sm
      .withColumn("_n", count(lit(1)).over(wch))
      .withColumn("_valley",
        when(v < lag(v, 1).over(wo) && v < lead(v, 1).over(wo), v))
      .withColumn("_peakv",
        when(v > lag(v, 1).over(wo) && v > lead(v, 1).over(wo), v))
    time("smooth + extremum marking")(marked)
    val floorRaw = marked
      .withColumn("_fv", coalesce(min(col("_valley")).over(wfr), lit(Double.NaN)))
      .withColumn("_cv", coalesce(max(col("_peakv")).over(wfr), lit(Double.NaN)))
      .withColumn("_m", col("_n") - 350)
      .filter(col("sample_idx") < col("_m") && col("_m") >= 175)
      .select(keys :+ col("sample_idx").as("_fi") :+ col("_fv") :+
        col("_cv") :+ col("_m"): _*)
    time("+ 348-frame sliding min/max")(floorRaw)
    val padded = Smoothing.blockRepeatPad(floorRaw, "_fi", "_m", 175)
      .withColumn("_plen", col("_m") + 2 * 175)
    val ext = Smoothing.nearestExtend(padded, "_plen", 150)
    val c301 = SavitzkyGolay.coeffs(301, 3)
    val wtap = Window.partitionBy(keys: _*).orderBy("_pos").rowsBetween(-150, 150)
    val env = ext
      .withColumn("_tf", collect_list(col("_fv")).over(wtap))
      .withColumn("_tc", collect_list(col("_cv")).over(wtap))
      .filter(col("_pos") >= 0 && col("_pos") < col("_plen"))
      .withColumn("_b", when(size(col("_tf")) === 301, Smoothing.sgDot(col("_tf"), c301)))
      .withColumn("_c", when(size(col("_tc")) === 301, Smoothing.sgDot(col("_tc"), c301)))
      .select(keys :+ col("_pos").as("sample_idx") :+
        when(!isnan(col("_b")), col("_b")).as("baseline") :+
        when(!isnan(col("_c")), col("_c")).as("ceiling"): _*)
    time("+ 301-tap windowed conv (full env)")(env)
    val enriched = graft.operators.Envelopes.withEnvelopes(sm)
    time("withEnvelopes (incl. final join)")(enriched)
    val det = graft.operators.PeakDetect.detectPeaks(enriched).toDF()
    time("+ detectPeaks")(det)
    time("q8 full")(graft.operators.BeatMetrics.metrics(enriched, det, markers = false))
    spark.stop()
  }
}
