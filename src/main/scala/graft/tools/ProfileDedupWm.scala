package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev tool: phase breakdown of the q199 dropDuplicatesWithinWatermark
  * fixture — collect, per-batch feed/process (with Spark's own
  * durationMs split), readback. Usage: ProfileDedupWm <sfDir> [nBatches]
  */
object ProfileDedupWm {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 4
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
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (iter <- 1 to 2) {
      println(s"--- iter $iter (nBatches=$nBatches)")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val tsu =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("ts div 1000")
        else unix_micros(col("ts"))
      val data = t("collect+sort") {
        ev.select(col("event_id"), col("event_type"), tsu.as("us"))
          .orderBy(col("us")).as[(Long, String, Long)].collect()
      }
      val doubled = data ++ data
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Long)]
      val name = s"prof_q199_${System.nanoTime()}"
      val in = stream.toDS().toDF("event_id", "event_type", "us")
        .withColumn("tsm", expr("timestamp_micros(us)"))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROF_STATE_PARTS", "4"))
      val q = t("query start") {
        in.withWatermark("tsm", "30 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append()).start()
      }
      doubled.grouped(doubled.length / nBatches + 1).zipWithIndex.foreach {
        case (ch, i) =>
          t(s"addData batch$i") {
            ch.grouped(math.max(1, ch.length / 32 + 1))
              .foreach(b => stream.addData(b.toIndexedSeq))
          }
          t(s"process batch$i")(q.processAllAvailable())
          Option(q.lastProgress).foreach { p =>
            println(s"[prof]   durationMs batch$i: ${p.durationMs}")
            println(s"[prof]   stateOps batch$i: " +
              p.stateOperators.map(so => s"rowsTotal=${so.numRowsTotal} " +
                s"updated=${so.numRowsUpdated} commitMs=${so.allUpdatesTimeMs}/" +
                s"${so.commitTimeMs} mem=${so.memoryUsedBytes}").mkString("; "))
          }
      }
      t("stop")(q.stop())
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      t("readback") {
        spark.table(name).select(col("event_id"), col("event_type"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
