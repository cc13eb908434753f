package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev tool: per-stage wall/task-CPU breakdown of the q319 streaming
  * retention fixture (round-17 verdict #3 — "contractual" was
  * asserted, not profiled per stage). Replicates streamRetentionRun's
  * exact driver loop with a timer around every stage:
  * fixture derivation (ingestSplit → occurrence collect), the
  * per-invocation base-index rebuild, and per micro-batch the
  * manifest resolve, the retry-guard committedGens scan, the novelty
  * anti-join + delta write, the grow commit, the OPTIMIZE rewrite
  * (read resolved+delta → writeSpanIndex), the switch commit and the
  * retire() GC — then the final audit.
  *
  *   sbt "runMain graft.tools.ProfileRetention /root/testdata/sf0.1"
  */
object ProfileRetention {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val w = 8; val modN = 5; val nShards = 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val meter = org.apache.spark.graftshim.TaskCpuMeter.attach(
      spark.sparkContext)
    def t[T](label: String)(f: => T): T = {
      val k0 = meter.snapshotNs(); val t0 = System.nanoTime()
      val r = f
      println(f"[prof-ret] $label: wall ${(System.nanoTime() - t0) / 1e9}%.2f s cpu ${(meter.snapshotNs() - k0) / 1e9}%.2f s")
      r
    }
    for (iter <- 1 to 2) {
      println(s"--- iter $iter")
      val (incoming, base) = t("fixture: ingestSplit + base index write")(
        graft.operators.Dedup.streamRetentionParts(spark, dir, w, modN, nShards))
      val pre = t("fixture: pre-audit shard counts")(
        graft.operators.Dedup.shardCounts(spark, Seq(base), "n_existing")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
      val occ = t("fixture: span occurrences collect")(
        graft.operators.Dedup.spanOccurrencesOf(incoming, w)
          .select(col("doc_id"), col("h"))
          .as[(Long, Long)].collect().sortBy(identity))
      val deltaRoot = graft.operators.ArtifactStore.invocationDir(
        "span_index_profret", dir, w.toString, modN.toString,
        nShards.toString, iter.toString)
      val mroot = graft.operators.ArtifactStore.invocationDir(
        "span_manifest_profret", dir, w.toString, modN.toString,
        nShards.toString, iter.toString)
      val F = graft.operators.IndexManifest.SpanIndexFormat
      graft.operators.IndexManifest.commit(spark, mroot, Seq(base), F)
      val stream =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val q = stream.toDS().toDF("doc_id", "h")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val ss = batch.sparkSession
          val gen = s"$deltaRoot/b$id"
          val resolved = t(s"b$id: manifest resolve")(
            graft.operators.IndexManifest.resolve(ss, mroot, F))
          val committed = t(s"b$id: committedGens retry guard")(
            graft.operators.IndexManifest.committedGens(ss, mroot))
          if (!committed.contains(gen)) {
            t(s"b$id: novelty anti-join + delta write") {
              val novel = batch.select(col("h")).distinct()
                .join(graft.operators.Dedup.readSpanIndexDirs(ss, resolved),
                  Seq("h"), "left_anti")
              graft.operators.Dedup.writeSpanDelta(novel, gen, nShards)
            }
            t(s"b$id: grow commit")(
              graft.operators.IndexManifest.commit(ss, mroot,
                resolved :+ gen, F))
            val compacted = graft.operators.ArtifactStore.invocationDir(
              "span_index_profretc", dir, w.toString, modN.toString,
              nShards.toString, iter.toString)
            t(s"b$id: OPTIMIZE rewrite (read ${resolved.size + 1} gens + write)")(
              graft.operators.Dedup.writeSpanIndex(
                graft.operators.Dedup.readSpanIndexDirs(ss, resolved :+ gen),
                compacted, nShards))
            t(s"b$id: switch commit")(
              graft.operators.IndexManifest.commit(ss, mroot,
                Seq(compacted), F))
            val gone = t(s"b$id: retire GC")(
              graft.operators.IndexManifest.retire(ss, mroot, keepLast = 2))
            println(s"[prof-ret] b$id: retired ${gone.size} generation dirs")
          }
          ()
        }
        .outputMode(OutputMode.Update()).start()
      try {
        val docIds = occ.map(_._1).distinct
        val chunks = docIds.grouped(math.max(1, docIds.length / 3 + 1)).toSeq
        chunks.zipWithIndex.foreach { case (ids, i) =>
          val set = ids.toSet
          val chunk = occ.filter(o => set(o._1))
          if (chunk.nonEmpty) {
            chunk.grouped(math.max(1, chunk.length / 32 + 1))
              .foreach(b => stream.addData(b.toIndexedSeq))
            t(s"processAllAvailable chunk$i (incl. batch stages above)")(
              q.processAllAvailable())
          }
        }
      } finally q.stop()
      t("final audit")(
        graft.operators.Dedup.refreshAuditOf(spark, pre,
          graft.operators.Dedup.shardCounts(spark,
            graft.operators.IndexManifest.resolve(spark, mroot, F),
            "n_refreshed"),
          "shard", "n_refreshed")
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
