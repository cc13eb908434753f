package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact→dimension joins.
  *
  * When one join key carries a disproportionate share of the fact
  * rows, the shuffle sends that whole key to one reducer and the
  * stage runs at the speed of its hottest partition. Salting splits
  * each fact key into `saltFactor` sub-keys (a deterministic spread
  * over the fact row) and replicates each dimension row `saltFactor`
  * times, so the hot key fans out over `saltFactor` reducers. AQE's
  * skew-join handles the sort-merge case adaptively; this helper is
  * for when the dimension is join-able but too big to broadcast and
  * the skew is known ahead of time — the classic pre-AQE pattern,
  * still the right tool for deterministic layouts (e.g. feeding a
  * bucketed write).
  */
object SkewJoin {

  /** Equi-join `fact ⋈ dim` on `key`, spreading each fact key over
    * `saltFactor` sub-keys. Result equals the plain inner equi-join
    * row-for-row (salt columns are internal).
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // deterministic per-row spread: hash of the whole fact row
    val f = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(saltFactor.toLong)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
