package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{BeatMetrics, Envelopes, PeakDetect, Smoothing}

/** SURVEY §5.2 property tests over seeded random signals: invariants
  * that must hold for ANY input, not just the committed fixture.
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def signal(seed: Long, n: Int = 1200, channels: Int = 2): DataFrame = {
    val rng = new java.util.Random(seed)
    (0 until channels).flatMap { ch =>
      (0 until n).map { i =>
        val beat = 400.0 * math.exp(-math.pow((i % 300) - 150.0, 2) / 400.0)
        SignalRow("p", ch, i.toLong, i / 100.0,
          1000.0 + beat + rng.nextGaussian() * 10)
      }
    }.toDS().toDF()
  }

  private def enriched(df: DataFrame): DataFrame =
    Envelopes.withEnvelopes(Smoothing.withSmooth(df))

  test("envelopes bracket the smooth signal away from null zones") {
    val e = enriched(signal(31))
    // the envelope is a smoothed extremum-of-frame series, so allow the
    // SG overshoot margin; the bracket must hold structurally:
    // baseline stays below ceiling wherever both exist
    val violations = e.filter($"baseline".isNotNull && $"ceiling".isNotNull &&
      $"baseline" > $"ceiling").count()
    assert(violations === 0L)
    // and the diastolic reference sits strictly between them (r=0.1)
    val dOut = e.filter($"diastolic".isNotNull &&
      ($"diastolic" < least($"baseline", $"ceiling") - lit(1e-9) ||
       $"diastolic" > greatest($"baseline", $"ceiling") + lit(1e-9))).count()
    assert(dOut === 0L)
  }

  test("candidate set is invariant under amplitude scaling (relative gate)") {
    val base = signal(32)
    val scaled = base.withColumn("y", $"y" * 3.5)
    def gatedIdx(df: DataFrame): Set[Long] =
      PeakDetect.gated(enriched(df))
        .select("sample_idx").collect().map(_.getLong(0)).toSet
    assert(gatedIdx(base) === gatedIdx(scaled))
  }

  test("detected peak count and positions survive amplitude scaling") {
    val base = signal(33)
    val scaled = base.withColumn("y", $"y" * 0.25)
    def peaks(df: DataFrame): Set[Long] =
      PeakDetect.detectPeaks(enriched(df)).toDF()
        .select("peak_idx").collect().map(_.getLong(0)).toSet
    // prominence/width thresholds are absolute, so only DOWN-scaling
    // can drop peaks; verify scaled ⊆ base and base ≠ ∅
    val (pb, ps) = (peaks(base), peaks(scaled))
    assert(pb.nonEmpty)
    assert(ps.subsetOf(pb))
  }

  test("beat metrics are non-negative and duration = ttp + ttr when present") {
    val e = enriched(signal(34))
    val m = BeatMetrics.metrics(e, PeakDetect.detectPeaks(e).toDF())
    val rows = m.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def d(c: String): Option[Double] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
      d("time_to_peak").foreach(v => assert(v >= 0.0))
      d("time_to_relaxation").foreach(v => assert(v >= 0.0))
      (d("time_to_peak"), d("time_to_relaxation"), d("duration")) match {
        case (Some(p), Some(q), Some(dur)) => assert(dur === q + p)
        case (_, _, Some(_)) => fail("duration present without both parts")
        case _ => ()
      }
    }
  }

  test("channel partition permutation does not change per-channel results") {
    val df = signal(35)
    val shuffled = df.repartition(7).sortWithinPartitions("y") // scramble
    def summarize(d: DataFrame): Map[Int, Long] =
      PeakDetect.detectPeaks(enriched(d)).toDF()
        .groupBy("channel").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(summarize(shuffled) === summarize(df))
  }
}
