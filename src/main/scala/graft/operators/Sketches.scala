package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic-structure operators beyond the KMV / Misra-Gries /
  * reservoir UDAF family: Count-Min frequency estimation and
  * Bloom-filter join pruning — the two classic bounded-memory
  * structures a 100 TB pipeline uses when exact per-key state is too
  * wide. Both are built from PLAIN relational aggregates over
  * deterministic integer hash arithmetic, so the DuckDB oracle
  * replays them bit-for-bit (every counter is an exact integer sum;
  * nothing here is approximate ACROSS engines, only vs. the exact
  * answer — which the queries also compute, to audit the error).
  *
  * Citation: the reference (joaomena17/myodish-peak-analysis) has no
  * sketch surface; this extends SURVEY §2.9's LLM-pipeline family.
  */
object Sketches {

  import graft.functions.TextHash.P

  /** Pairwise-independent-style hash rows (j, a, b): fixed odd
    * multiplier constants, identical literals in the oracle SQL.
    */
  def cmHashRows(d: Int): Seq[(Int, Long, Long)] =
    (0 until d).map { j =>
      val a = (2654435761L * (j + 1) + 40503L) % P match {
        case 0 => 1L
        case x => x
      }
      val b = (97531L * (j + 1) + 12289L) % P
      (j, a, b)
    }

  /** Q107 — Count-Min sketch frequency estimation over the events
    * user stream, audited against exact counts for the top-20 users.
    *
    * Scale shape: per-user exact counts collapse the event log ONCE
    * (map-side combinable — the same first aggregate any per-key
    * stat needs); the d×w counter matrix then aggregates from that
    * user-level table, so the sketch build shuffles user-cardinality
    * rows, never the log, and the counter table itself is d·w rows
    * (1024 here) — broadcastable state wherever it is consumed. The
    * top-20 probe set joins the counter matrix on (j, bucket): 20·d
    * lookup rows against a broadcast. At 100 TB the exact per-user
    * aggregate is the expensive-but-linear pass and the sketch is
    * free; when even user cardinality is too wide for the exchange,
    * the counters aggregate directly from a d-exploded event
    * projection instead (same arithmetic, log-sized shuffle) — the
    * trade the scaladoc'd plan makes explicit.
    *
    * CM guarantee audited in-result: est_n ≥ exact_n always (counts
    * only collide upward), est_n ≤ exact_n + εN w.h.p. The est is
    * `min` over d=4 rows of w=256 counters.
    */
  def cmFrequency(s: SparkSession, dir: String, d: Int = 4, w: Int = 256,
                  topK: Int = 20): DataFrame = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    // Eager checkpoint, not a lazy cache (round-18, the q217/C7
    // discipline): the per-user aggregate feeds three concurrent
    // branches of one plan (the broadcast counter build, the top-K
    // probe selection, and the lookup fan-out), and branches racing a
    // lazy cache recompute the event-log aggregate per branch.
    // CONSUME-ONCE: blocks released after the first successful action.
    val exact = CheckpointOrphans.adopt(
      ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
        .localCheckpoint())
    val rows = cmHashRows(d)
    def bucket(a: Long, b: Long, key: Column): Column =
      pmod(pmod(lit(a) * key + lit(b), lit(P)), lit(w.toLong))
    // counter matrix from the user-level aggregate: d rows per user
    val counters = exact.select(col("exact_n"),
        explode(array(rows.map { case (j, a, b) =>
          struct(lit(j).as("j"), bucket(a, b, col("user_id")).as("bucket"))
        }: _*)).as("x"))
      .groupBy(col("x.j").as("j"), col("x.bucket").as("bucket"))
      .agg(sum(col("exact_n")).as("cnt"))
    val probes = exact
      .orderBy(col("exact_n").desc, col("user_id")).limit(topK)
    val lookups = probes.select(col("user_id"), col("exact_n"),
        explode(array(rows.map { case (j, a, b) =>
          struct(lit(j).as("j"), bucket(a, b, col("user_id")).as("bucket"))
        }: _*)).as("x"))
      .select(col("user_id"), col("exact_n"),
        col("x.j").as("j"), col("x.bucket").as("bucket"))
    lookups.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("cnt")).as("est_n"))
      .select(col("user_id"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"))
  }

  /** Q108 — Bloom-filter semi-join pruning audit: the scan-side
    * technique that keeps a selective join from shuffling the whole
    * fact table. The key set (suppliers of one nation) hashes into a
    * k=3, m=8192-bit filter represented as its SET of occupied bit
    * positions — engine-exact, and exactly what a real filter's
    * bitmap encodes; a fact row survives iff all k of its positions
    * are occupied.
    *
    * Scale shape: the bit-position set is dimension-sized (≤ k·|dim|
    * rows, here ≤ 1.2k) and BROADCAST; the fact side is a narrow
    * projection (compute k positions) + a broadcast semi-join per
    * position counted up to k — the fact table never shuffles, which
    * is the entire point: at 100 TB the filter rides to the scan and
    * the exchange only carries survivors. The result row audits the
    * pruning: total fact rows, bloom survivors, true matches, false
    * positives (survivors − matches ≥ 0; never a false negative —
    * also asserted by the oracle equality itself).
    */
  def bloomPruneAudit(s: SparkSession, dir: String, nation: String = "NATION_7",
                      m: Int = 8192, k: Int = 3): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
    val sup = s.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val keys = sup.join(broadcast(nat),
        col("s_nationkey") === col("n_nationkey") && col("n_name") === nation)
      .select(col("s_suppkey").as("key"))
    val rows = cmHashRows(k)
    def pos(a: Long, b: Long, key: Column): Column =
      pmod(pmod(lit(a) * key + lit(b), lit(P)), lit(m.toLong))
    val bits = keys.select(explode(array(rows.map { case (_, a, b) =>
        pos(a, b, col("key")) }: _*)).as("bit"))
      .distinct()
    // membership is a property of the KEY: test each distinct suppkey
    // once (k exploded position rows against the broadcast bit set —
    // all k must be occupied), then count surviving FACT ROWS via a
    // broadcast semi-join. Grouping by fact row ids would be wrong
    // here: the synthetic lineitem has duplicate (orderkey,
    // linenumber) rows, and at 100 TB the distinct-key table is the
    // smaller input anyway.
    val skeys = li.select(col("l_suppkey")).distinct()
    val passKeys = skeys
      .select(col("l_suppkey"),
        explode(array(rows.map { case (_, a, b) =>
          pos(a, b, col("l_suppkey")) }: _*)).as("bit"))
      .join(broadcast(bits), Seq("bit"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === k)
      .select(col("l_suppkey"))
    val nFact = li.agg(count(lit(1)).as("n_fact"))
    val nPass = li.join(broadcast(passKeys), Seq("l_suppkey"), "left_semi")
      .agg(count(lit(1)).as("n_bloom_pass"))
    val nTrue = li.join(broadcast(keys), col("l_suppkey") === col("key"),
        "left_semi")
      .agg(count(lit(1)).as("n_true_match"))
    nFact.crossJoin(nPass).crossJoin(nTrue) // three 1-row aggregates
      .select(col("n_fact"), col("n_bloom_pass"), col("n_true_match"),
        (col("n_bloom_pass") - col("n_true_match")).as("n_false_pos"))
  }

  /** Q111 — quantile SKETCH per event type: approximate p50/p90/p99
    * from a deterministic bottom-k hash sample (HashValueReservoir —
    * the k rows with the smallest polyHash(event_id), a uniform
    * reproducible sample), audited in-result against the exact
    * percentiles. The bounded-state alternative to q32 at 100 TB:
    * exact `percentile` buffers every group value through the
    * exchange, the reservoir carries ≤ k (hash, id, value) triples
    * per partition — a mergeable partial aggregate, same contract as
    * the KMV/MG sketches. At real scale only the `est_*` side runs;
    * the exact side here is the error audit (and the driver's
    * determinism check: sample membership is a pure function of the
    * data, so both engines interpolate identical order statistics).
    */
  def sketchQuantiles(s: SparkSession, dir: String, k: Int = 128): DataFrame = {
    import s.implicits._
    val ev = s.read.parquet(s"$dir/events.parquet")
    val res = new graft.functions.HashValueReservoir(k)
    val sample = ev
      .select(col("event_type"),
        graft.functions.TextHash.polyHash(col("event_id").cast("string")).as("h"),
        col("event_id"), col("value"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .agg(res.toColumn.name("vals"))
      .toDF("event_type", "vals")
    val est = sample
      .select(col("event_type"), explode(col("vals")).as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("sample_k"),
        percentile(col("v"), lit(0.5)).as("est_p50"),
        percentile(col("v"), lit(0.9)).as("est_p90"),
        percentile(col("v"), lit(0.99)).as("est_p99"))
    val exact = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        percentile(col("value"), lit(0.5)).as("exact_p50"),
        percentile(col("value"), lit(0.9)).as("exact_p90"),
        percentile(col("value"), lit(0.99)).as("exact_p99"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_rows"), col("sample_k"),
        col("est_p50"), col("est_p90"), col("est_p99"),
        col("exact_p50"), col("exact_p90"), col("exact_p99"))
  }
}
