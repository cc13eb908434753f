package graft

import org.apache.spark.sql.functions._
import graft.operators.{Envelopes, Smoothing}

class EnvelopesSpec extends SparkSpec {
  import spark.implicits._

  // A channel long enough for the 350/301 machinery: sine + offset.
  private def sine(n: Int, ch: Int = 0) =
    (0 until n).map { i =>
      SignalRow("e", ch, i.toLong, i / 100.0,
        1000.0 + 300.0 * math.sin(i / 20.0))
    }.toDS().toDF()

  test("envelopes bracket the signal away from edges; diastolic between them") {
    val df = Envelopes.withEnvelopes(Smoothing.withSmooth(sine(1200)))
    val rows = df.filter($"sample_idx".between(300, 700))
      .select("y_smooth", "baseline", "ceiling", "diastolic").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, c, d) = (r.getAs[Double]("baseline"), r.getAs[Double]("ceiling"),
        r.getAs[Double]("diastolic"))
      assert(b < c, s"baseline $b !< ceiling $c")
      assert(d > b && d < c, s"diastolic $d outside ($b,$c)")
      assert(math.abs(d - (b + 0.1 * (c - b))) < 1e-9)
    }
  }

  test("output keeps exactly n rows per channel with envelope columns") {
    val df = Envelopes.withEnvelopes(Smoothing.withSmooth(sine(900)))
    assert(df.count() === 900)
    assert(df.filter($"baseline".isNotNull).count() === 900)
  }

  test("monotone 350-sample stretch poisons envelopes to null (NaN parity)") {
    // ramp has no interior local minima anywhere -> every frame NaN ->
    // nulls everywhere after SG.
    val ramp = (0 until 900).map { i =>
      SignalRow("e", 0, i.toLong, i / 100.0, i.toDouble)
    }.toDS().toDF()
    val df = Envelopes.withEnvelopes(Smoothing.withSmooth(ramp))
    assert(df.filter($"baseline".isNotNull).count() === 0)
    assert(df.filter($"diastolic".isNotNull).count() === 0)
  }

  test("short channel (n < 525) degrades to null envelopes, does not crash") {
    val df = Envelopes.withEnvelopes(Smoothing.withSmooth(sine(400)))
    assert(df.count() === 400)
    assert(df.filter($"baseline".isNotNull).count() === 0)
  }
}
