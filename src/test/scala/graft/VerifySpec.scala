package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** The Verify failure contract (round-10 verdict "What's missing" #1):
  * `dumpOrMark` guards the round's most important artifact — the
  * driver's correctness dump — so its two paths get their own
  * regression pins here instead of only being exercised implicitly
  * by healthy full runs.
  */
class VerifySpec extends SparkSpec {

  private def withOutDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-verify").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory)
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(): Unit
      }
      rm(dir)
    }
  }

  private val healthy: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("id")

  // throws at PLAN TIME (the q267 shape: an unresolved column fails
  // analysis before any job runs)
  private val planTimeFail: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("id").selectExpr("no_such_column")

  // throws at EXECUTION TIME, after the writer may have opened the
  // output dir — the path that must scrub partial writes
  private val runTimeFail: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("id")
      .selectExpr("assert_true(id < 2, 'boom') as chk", "id")

  test("dumpOrMark: healthy query dumps parquet, returns rows, leaves no _ERROR") {
    withOutDir { out =>
      val r = Verify.dumpOrMark(spark, "q_ok", healthy, "unused", out)
      assert(r === Right(5L))
      val d = new java.io.File(s"$out/q_ok")
      assert(d.isDirectory)
      assert(d.listFiles().exists(_.getName.endsWith(".parquet")))
      assert(!new java.io.File(s"$out/q_ok/_ERROR").exists())
      assert(Verify.footerRowCount(spark, s"$out/q_ok") === 5L)
    }
  }

  test("dumpOrMark: plan-time failure yields _ERROR with the message") {
    withOutDir { out =>
      val r = Verify.dumpOrMark(spark, "q_bad", planTimeFail, "unused", out)
      assert(r.isLeft)
      val msg = r.swap.getOrElse("")
      assert(msg.toLowerCase.contains("no_such_column"),
        s"marker should carry the analysis error, got: $msg")
      val marker = new java.io.File(s"$out/q_bad/_ERROR")
      assert(marker.isFile, "driver-visible _ERROR marker must exist")
      assert(new String(Files.readAllBytes(marker.toPath)) === msg)
      // no parquet footprint next to the marker
      assert(!new java.io.File(s"$out/q_bad").listFiles()
        .exists(_.getName.endsWith(".parquet")))
    }
  }

  test("dumpOrMark: execution-time failure scrubs the partial write") {
    withOutDir { out =>
      // pre-seed junk where the dump would land, standing in for a
      // half-written parquet dir from the failed attempt
      val d = new java.io.File(s"$out/q_part")
      d.mkdirs()
      Files.write(new java.io.File(d, "part-junk.parquet").toPath,
        "junk".getBytes)
      val r = Verify.dumpOrMark(spark, "q_part", runTimeFail, "unused", out)
      assert(r.isLeft)
      val files = new java.io.File(s"$out/q_part").listFiles().map(_.getName)
      assert(files.contains("_ERROR"))
      assert(!files.exists(_.endsWith(".parquet")),
        s"partial write must be scrubbed, found: ${files.mkString(", ")}")
    }
  }

  test("dumpOrMark: one query's failure does not poison the next dump") {
    withOutDir { out =>
      assert(Verify.dumpOrMark(spark, "q_bad", planTimeFail, "u", out).isLeft)
      assert(Verify.dumpOrMark(spark, "q_ok", healthy, "u", out) === Right(5L))
      assert(!new java.io.File(s"$out/q_ok/_ERROR").exists())
    }
  }

  test("fsWriteString: overwrites in place (failures.json is rewritten per run)") {
    withOutDir { out =>
      Verify.fsWriteString(spark, s"$out/failures.json", """{"a": "x"}""")
      Verify.fsWriteString(spark, s"$out/failures.json", "{}")
      val got = new String(
        Files.readAllBytes(new java.io.File(s"$out/failures.json").toPath))
      assert(got === "{}")
    }
  }
}
