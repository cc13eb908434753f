package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Property pins for the Count-Min / Bloom operators (q107/q108):
  * the one-sided error guarantees hold on adversarial fixtures, and
  * collisions only ever push estimates UP (CM) or let extra rows
  * through (Bloom) — never the reverse.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("sketch").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("cmFrequency: estimates are exact without collisions, never under") {
    withDir { dir =>
      val rng = new java.util.Random(107)
      // 50 users, zipf-ish counts — far fewer than w=256 buckets
      val rows = (0 until 50).flatMap { u =>
        Seq.fill(1 + 200 / (u + 1))((u.toLong * 13 + 1, u.toLong,
          "click", rng.nextDouble(), "{}"))
      }.zipWithIndex.map { case ((_, u, t, v, p), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
          u, t, v, p)
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Sketches.cmFrequency(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.length === 20)
      assert(out.forall(_._4 >= 0), s"CM must never undercount: ${out.toSeq}")
      // 50 users into 4×256 buckets: w.h.p. the min row is collision-free
      assert(out.count(_._4 == 0) >= 15,
        s"most estimates should be exact at this load: ${out.toSeq}")
    }
  }

  test("cmFrequency under forced collisions (w=4): still one-sided") {
    withDir { dir =>
      val rows = (0 until 200).map { i =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
          (i % 40).toLong, "view", 1.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Sketches.cmFrequency(spark, dir, d = 4, w = 4, topK = 10)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      // 40 users into 4 buckets per row: collisions guaranteed, so some
      // estimate strictly exceeds its exact count — but never undershoots
      assert(out.forall { case (exact, est) => est >= exact })
      assert(out.exists { case (exact, est) => est > exact },
        s"w=4 must force an overcount: ${out.toSeq}")
    }
  }

  test("bloomPruneAudit: no false negatives, exact on a planted key set") {
    withDir { dir =>
      val rng = new java.util.Random(108)
      (0L until 20L).map(n => (n, s"NATION_$n"))
        .toDF("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      (0L until 200L).map(sk => (sk, sk % 20))
        .toDF("s_suppkey", "s_nationkey")
        .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      val li = (0 until 5000).map { i =>
        (i.toLong / 4, (i % 4).toLong, rng.nextInt(200).toLong)
      }
      li.toDF("l_orderkey", "l_linenumber", "l_suppkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val r = Sketches.bloomPruneAudit(spark, dir, nation = "NATION_7")
        .head()
      val (nFact, nPass, nTrue, nFp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val expectTrue = li.count(_._3 % 20 == 7)
      assert(nFact === 5000L)
      assert(nTrue === expectTrue.toLong)
      assert(nPass >= nTrue, "a Bloom filter must never drop a true match")
      assert(nFp === nPass - nTrue && nFp >= 0)
      // m=8192 bits vs 10 keys: pruning should be near-exact here
      assert(nFp <= nFact / 10, s"false-positive volume implausible: $nFp")
    }
  }
}
