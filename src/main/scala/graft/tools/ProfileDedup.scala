package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-by-stage timing of the MinHash pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("docs scan")(noop(docs))
    val sh = graft.operators.Dedup.shingleHashes(docs)
    time("shingleHashes")(noop(sh))
    time("shingleHashes again")(noop(sh))
    val sig = graft.operators.Dedup.minhashSignatures(spark, docs)
    time("signatures")(noop(sig))
    time("full q15c")(noop(graft.operators.Dedup.minhashLsh(spark, sfDir)))
    val pairs = graft.operators.Dedup.minhashLsh(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b")
    val mat = pairs.cache()
    time("pairs materialize")(noop(mat))
    time("cc over cached pairs")(
      noop(graft.operators.Dedup.connectedComponents(mat)))
    time("full q38")(noop(graft.operators.Dedup.dupClusters(spark, sfDir)))
    spark.stop()
  }
}
