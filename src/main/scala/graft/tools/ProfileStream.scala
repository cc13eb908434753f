package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev tool: phase breakdown of the q50 streaming fixture — where do
  * the seconds go (feed collect, addData encode, per-batch execution,
  * readback)? Usage: ProfileStream <sfDir>
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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
      println(s"--- iter $iter")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val tsu =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("ts div 1000")
        else unix_micros(col("ts"))
      val data = t("collect+sort") {
        ev.select(col("event_type"), tsu.as("us"))
          .orderBy(col("us")).as[(String, Long)].collect()
      }
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long)]
      val name = s"prof_q50_${System.nanoTime()}"
      val in = stream.toDS().toDF("event_type", "us")
        .withColumn("tsm", expr("timestamp_micros(us)"))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROF_STATE_PARTS", "4"))
      val ckRoot = sys.env.get("PROF_CKPT_SHM").map { _ =>
        val p = s"/dev/shm/graft_prof_ck_${System.nanoTime()}"
        spark.conf.set("spark.sql.streaming.checkpointLocation", p)
        p
      }
      val q = t("query start") {
        in.withWatermark("tsm", "30 minutes")
          .groupBy(col("event_type"),
            window(col("tsm"), "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("event_type"),
            unix_micros(col("w.start")).as("window_start_us"), col("n_events"))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Update()).start()
      }
      data.grouped(data.length / 3 + 1).zipWithIndex.foreach { case (ch, i) =>
        t(s"addData batch$i") {
          ch.grouped(math.max(1, ch.length / 32 + 1))
            .foreach(b => stream.addData(b.toIndexedSeq))
        }
        t(s"process batch$i")(q.processAllAvailable())
        Option(q.lastProgress).foreach { p =>
          println(s"[prof]   durationMs batch$i: ${p.durationMs}")
        }
      }
      t("stop")(q.stop())
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      ckRoot.foreach { p =>
        spark.conf.unset("spark.sql.streaming.checkpointLocation")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      }
      val out = t("readback") {
        spark.table(name)
          .groupBy(col("event_type"), col("window_start_us"))
          .agg(max(col("n_events")).as("n_events"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
