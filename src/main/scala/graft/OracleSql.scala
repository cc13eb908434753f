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

  /** FIR over a window named `w`, chunked exactly like Smoothing.sgDot:
    * (0.0 + c₀·lag(v,k) + … ≤100 terms) + (0.0 + …) + … — same chunk
    * boundaries, same left-assoc order, bitwise-identical to the Spark
    * plan. (Also keeps each chain under DuckDB's 128-deep binder limit.)
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
    terms.grouped(graft.operators.Smoothing.dotChunk)
      .map(g => "(0.0 + " + g.mkString(" + ") + ")")
      .mkString(" + ")
  }

  /** CTEs: `sig` (the committed fixture) and `cnt` (per-channel length). */
  def sigCtes: String =
    s"""sig AS (SELECT experiment_id, channel, sample_idx, t, y FROM read_parquet('$signalGlob')),
       |cnt AS (SELECT experiment_id, channel, count(*) AS n FROM sig GROUP BY 1, 2)""".stripMargin

  /** CTE chain: smooth series as `smooth(experiment_id, channel,
    * sample_idx, v)` — mirrors Smoothing.withSmooth (block-repeat pad 25,
    * 51-tap SG, strip).
    */
  def smoothCtes(window: Int = 51, polyorder: Int = 7): String = {
    val k = window / 2
    val c = SavitzkyGolay.coeffs(window, polyorder)
    s"""sp AS (
       |  SELECT experiment_id, channel, sample_idx AS pos, y FROM sig WHERE sample_idx < $k
       |  UNION ALL
       |  SELECT experiment_id, channel, sample_idx + $k AS pos, y FROM sig
       |  UNION ALL
       |  SELECT s.experiment_id, s.channel, s.sample_idx + ${2 * k} AS pos, s.y
       |  FROM sig s JOIN cnt c USING (experiment_id, channel)
       |  WHERE s.sample_idx >= c.n - $k
       |),
       |sm AS (
       |  SELECT experiment_id, channel, pos, ${sgTerms("y", c)} AS v
       |  FROM sp
       |  WINDOW w AS (PARTITION BY experiment_id, channel ORDER BY pos)
       |),
       |smooth AS (
       |  SELECT s.experiment_id, s.channel, s.pos - $k AS sample_idx, s.v
       |  FROM sm s JOIN cnt c USING (experiment_id, channel)
       |  WHERE s.pos >= $k AND s.pos < c.n + $k
       |)""".stripMargin
  }

  /** CTE chain: envelopes + diastolic, ending in
    * `enriched(experiment_id, channel, sample_idx, t, y, y_smooth,
    * baseline, ceiling, diastolic, n)` — mirrors Envelopes.withEnvelopes
    * (strict-neighbor extremum marking, forward-frame interior min/max,
    * block-repeat pad 175, SG 301/3 with nearest-edge extension).
    */
  def enrichedCtes(cfg: graft.PeakConfig = graft.PeakConfig()): String = {
    val bigW = cfg.auxWindowSize // 350
    val sw = cfg.auxSmoothingWindow // 301
    val pad = math.max(bigW, sw) / 2 // 175
    val k = sw / 2 // 150
    val c = SavitzkyGolay.coeffs(sw, cfg.auxPolyorder)
    s"""$sigCtes,
       |${smoothCtes(cfg.smoothWindow, cfg.smoothPolyorder)},
       |mark AS (
       |  SELECT s.experiment_id, s.channel, s.sample_idx, s.v, c.n,
       |    CASE WHEN s.v < lag(s.v, 1) OVER w AND s.v < lead(s.v, 1) OVER w THEN s.v END AS valley_v,
       |    CASE WHEN s.v > lag(s.v, 1) OVER w AND s.v > lead(s.v, 1) OVER w THEN s.v END AS peak_v
       |  FROM smooth s JOIN cnt c USING (experiment_id, channel)
       |  WINDOW w AS (PARTITION BY experiment_id, channel ORDER BY sample_idx)
       |),
       |fr AS (
       |  SELECT experiment_id, channel, sample_idx, n,
       |    min(valley_v) OVER wf AS fv,
       |    max(peak_v) OVER wf AS cv
       |  FROM mark
       |  WINDOW wf AS (PARTITION BY experiment_id, channel ORDER BY sample_idx
       |                ROWS BETWEEN 1 FOLLOWING AND ${bigW - 2} FOLLOWING)
       |),
       |dom AS (
       |  SELECT experiment_id, channel, sample_idx AS fi, fv, cv, n, n - $bigW AS m
       |  FROM fr WHERE sample_idx < n - $bigW AND n - $bigW >= $pad
       |),
       |ep AS (
       |  SELECT experiment_id, channel, fi AS pos, fv, cv, n FROM dom WHERE fi < $pad
       |  UNION ALL
       |  SELECT experiment_id, channel, fi + $pad AS pos, fv, cv, n FROM dom
       |  UNION ALL
       |  SELECT experiment_id, channel, fi + ${2 * pad} AS pos, fv, cv, n FROM dom WHERE fi >= m - $pad
       |),
       |ee AS (
       |  SELECT * FROM ep
       |  UNION ALL
       |  SELECT p.experiment_id, p.channel, g.gs AS pos, p.fv, p.cv, p.n
       |  FROM ep p, generate_series(-$k, -1) AS g(gs) WHERE p.pos = 0
       |  UNION ALL
       |  SELECT p.experiment_id, p.channel, p.n + g.gs AS pos, p.fv, p.cv, p.n
       |  FROM ep p, generate_series(0, ${k - 1}) AS g(gs) WHERE p.pos = p.n - 1
       |),
       |env AS (
       |  SELECT experiment_id, channel, pos AS sample_idx,
       |    ${sgTerms("fv", c)} AS baseline,
       |    ${sgTerms("cv", c)} AS ceiling
       |  FROM ee
       |  WINDOW w AS (PARTITION BY experiment_id, channel ORDER BY pos)
       |  QUALIFY pos >= 0 AND pos < n
       |),
       |enriched AS (
       |  SELECT s.experiment_id, s.channel, s.sample_idx, s.t, s.y,
       |    sm2.v AS y_smooth, e.baseline, e.ceiling,
       |    e.baseline + ${dlit(cfg.relativeToBaseline)} * (e.ceiling - e.baseline) AS diastolic,
       |    c.n
       |  FROM sig s
       |  JOIN smooth sm2 USING (experiment_id, channel, sample_idx)
       |  LEFT JOIN env e USING (experiment_id, channel, sample_idx)
       |  JOIN cnt c USING (experiment_id, channel)
       |)""".stripMargin
  }

  /** Q1 — O3 smooth: block-repeat pad by 25, 51-tap SG, strip. */
  def q1Smooth(window: Int = 51, polyorder: Int = 7): String =
    s"""WITH $sigCtes,
       |${smoothCtes(window, polyorder)}
       |SELECT experiment_id, channel, sample_idx, v AS y_smooth FROM smooth""".stripMargin

  /** Q2/Q3/Q4 — envelope column projections off the enriched chain. */
  def qEnriched(outCol: String): String =
    s"""WITH ${enrichedCtes()}
       |SELECT experiment_id, channel, sample_idx, $outCol FROM enriched""".stripMargin
}
