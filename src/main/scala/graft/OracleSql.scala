package graft

import graft.functions.SavitzkyGolay

/** Generates the DuckDB oracle SQL (driver t2 contract, SURVEY §2.9).
  *
  * Every fragment mirrors the Spark plan's arithmetic *association
  * order* (left-assoc FIR sums starting at 0.0) so both engines produce
  * bitwise-identical doubles — hash-matching then survives any rounding
  * the driver applies. Double literals use `Double.toString`, which
  * round-trips exactly.
  */
object OracleSql {
  val signalGlob = s"${graft.sources.SignalFixture.signalPath}/*.parquet"
  val stimGlob = s"${graft.sources.SignalFixture.stimPath}/*.parquet"

  def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s.toLowerCase.replace("e", "e") else s
  }

  /** Left-assoc FIR over a window named `w`: 0.0 + c₀·lag(v,k) + … +
    * cₖ·v + … + c₂ₖ·lead(v,k). Exactly mirrors Smoothing.sgDot.
    */
  def sgTerms(valueCol: String, coeffs: Array[Double]): String = {
    val k = coeffs.length / 2
    val terms = coeffs.zipWithIndex.map { case (c, j) =>
      val off = j - k
      val tap =
        if (off < 0) s"lag($valueCol, ${-off}) OVER w"
        else if (off == 0) valueCol
        else s"lead($valueCol, $off) OVER w"
      s"(${dlit(c)}) * $tap"
    }
    "0.0 + " + terms.mkString(" + ")
  }

  /** CTEs: `sig` (the committed fixture) and `cnt` (per-channel length). */
  def sigCtes: String =
    s"""sig AS (SELECT experiment_id, channel, sample_idx, t, y FROM read_parquet('$signalGlob')),
       |cnt AS (SELECT experiment_id, channel, count(*) AS n FROM sig GROUP BY 1, 2)""".stripMargin

  /** Q1 — O3 smooth: block-repeat pad by 25, 51-tap SG, strip. */
  def q1Smooth(window: Int = 51, polyorder: Int = 7): String = {
    val k = window / 2
    val c = SavitzkyGolay.coeffs(window, polyorder)
    s"""WITH $sigCtes,
       |padded AS (
       |  SELECT experiment_id, channel, sample_idx AS pos, y FROM sig WHERE sample_idx < $k
       |  UNION ALL
       |  SELECT experiment_id, channel, sample_idx + $k AS pos, y FROM sig
       |  UNION ALL
       |  SELECT s.experiment_id, s.channel, s.sample_idx + ${2 * k} AS pos, s.y
       |  FROM sig s JOIN cnt c USING (experiment_id, channel)
       |  WHERE s.sample_idx >= c.n - $k
       |),
       |sm AS (
       |  SELECT experiment_id, channel, pos, ${sgTerms("y", c)} AS y_smooth
       |  FROM padded
       |  WINDOW w AS (PARTITION BY experiment_id, channel ORDER BY pos)
       |)
       |SELECT s.experiment_id, s.channel, s.pos - $k AS sample_idx, s.y_smooth
       |FROM sm s JOIN cnt c USING (experiment_id, channel)
       |WHERE s.pos >= $k AND s.pos < c.n + $k""".stripMargin
  }
}
