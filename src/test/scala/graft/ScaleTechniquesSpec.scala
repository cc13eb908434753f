package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** The scale techniques the 100 TB design leans on, demonstrated and
  * pinned: salted joins preserve semantics while spreading hot keys;
  * bucketed tables co-locate a join with zero shuffle.
  */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on 90%-skewed data") {
    val rng = new java.util.Random(17)
    val fact = (0 until 5000).map { i =>
      val k = if (rng.nextDouble() < 0.9) 7L else rng.nextInt(100).toLong
      (i.toLong, k, rng.nextDouble())
    }.toDF("row_id", "key", "v")
    val dim = (0L until 100L).map(k => (k, s"dim$k")).toDF("key", "name")

    val plain = fact.join(dim, "key")
      .select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "key")
      .select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(salted.size === 5000)
  }

  test("salt actually spreads the hot key over multiple sub-keys") {
    val fact = (0 until 1000).map(i => (i.toLong, 7L)).toDF("row_id", "key")
    val spread = fact.withColumn("_salt",
        pmod(xxhash64(col("row_id"), col("key")), lit(8L)))
      .groupBy("_salt").count().collect()
    assert(spread.length === 8)
    assert(spread.map(_.getLong(1)).max < 1000L) // not all in one bucket
  }

  test("salting bounds task-level skew: 50%-hot key cannot serialize one task") {
    // adversarial fixture for the q60 shape: half the fact rows carry
    // ONE key. Unsalted, the hash exchange puts them all in a single
    // task (the stage runs at p100 = 50% of the table); salted, the
    // hot key fans out over saltFactor sub-keys and every task stays
    // within a small factor of the mean. Partition sizes are measured
    // on the same hash exchange the join's shuffle would use.
    val rng = new java.util.Random(60)
    val n = 100000
    val salt = 16
    val fact = (0 until n).map { i =>
      val k = if (i % 2 == 0) 7L else rng.nextInt(1000).toLong
      (i.toLong, k, rng.nextDouble())
    }.toDF("row_id", "key", "v")
    def partSizes(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.groupBy(spark_partition_id().as("p")).count()
        .collect().map(_.getLong(1))
    val unsalted = partSizes(fact.repartition(32, col("key")))
    val salted = partSizes(
      fact.withColumn("_salt",
          pmod(xxhash64(fact.columns.map(col): _*), lit(salt.toLong)))
        .repartition(32, col("key"), col("_salt")))
    val mean = n.toDouble / 32
    assert(unsalted.max >= n / 2,
      s"fixture must be adversarial: unsalted max ${unsalted.max}")
    assert(salted.max <= 4 * mean,
      s"salted p100 must stay near-balanced: max ${salted.max}, mean $mean")
    assert(salted.max * 4 <= unsalted.max,
      s"salting must cut the hottest task ≥4×: ${salted.max} vs ${unsalted.max}")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 100
      val fact = (0 until 30000).map { i =>
        (i.toLong, if (i % 10 < 9) 7L else (i % 100).toLong, pad)
      }.toDF("row_id", "key", "pad")
      val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("key", "name")
      val joined = fact.join(dim, "key")
      // execute THIS dataset (count() would plan a different query) so
      // its adaptive plan finalizes, then inspect the final plan: the
      // hot key-7 partition must have been split by OptimizeSkewedJoin
      assert(joined.collect().length === 30000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val n = 1000
    (0 until n).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_l")
    (0 until n).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_r")
    try {
      // merge hint defeats auto-broadcast so the co-location is what's
      // under test
      val smj = spark.table("graft_bucket_l").hint("merge")
        .join(spark.table("graft_bucket_r").hint("merge"), "k")
      val p = smj.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("ShuffleExchange"),
        s"bucketed SMJ must not shuffle:\n$p")
      assert(smj.count() === n.toLong)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    }
  }

  test("dynamic partition pruning: selective dim filter reaches the partitioned fact scan") {
    // The 100 TB shape: a date/source-partitioned fact table joined to
    // a filtered dimension must scan ONLY the partitions the dim rows
    // select — decided at RUNTIME from the dim side (static pruning
    // can't see through the join). Spark inserts a DPP subquery filter
    // on the partition column; without it, a 1000-partition fact scans
    // 1000 directories for a 2-partition query.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    try {
      (0 until 20000).map(i => (i.toLong, s"src${i % 10}", i % 97))
        .toDF("id", "source", "v")
        .write.partitionBy("source").mode("overwrite").parquet(s"$dir/fact")
      // The dim MUST come from a file scan: a local Seq collapses to a
      // LocalTableScan under ConvertToLocalRelation (filter folded in),
      // leaving no selective Filter node for PartitionPruning to turn
      // into a DPP subquery — exactly the false-red this test shipped
      // with in round 5.
      (0 until 10).map(i => (s"src$i", i % 5)).toDF("source", "grp")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      // broadcast keeps the dim side reusable as the DPP filter input
      val joined = fact.join(broadcast(dim.filter($"grp" === 1)), "source")
        .groupBy("source").count()
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.toLowerCase.contains("dynamicpruning"),
        s"no DPP filter on the partitioned scan:\n$p")
      // 2 of 10 sources survive grp=1
      assert(joined.collect().map(_.getString(0)).toSet
        === Set("src1", "src6"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
