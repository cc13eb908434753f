package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Property-style tests over seeded random inputs: the native
  * expressions must equal straightforward Scala reference folds —
  * this is the guard that the codegen'd loops keep the exact oracle
  * arithmetic.
  */
class HashExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomTexts(n: Int, seed: Long): Seq[String] = {
    val rng = new java.util.Random(seed)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABC0123456789 \t  "
    Seq.fill(n) {
      val len = rng.nextInt(120)
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
  }

  private def refPolyHash(s: String, base: Long, mod: Long): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, cp) =>
      java.lang.Math.floorMod(acc * base + cp, mod))

  test("polyHash equals the reference fold on 200 random strings") {
    val texts = randomTexts(200, seed = 1)
    val got = texts.toDF("s")
      .select(TextHash.polyHash($"s").as("h")).collect().map(_.getLong(0))
    assert(got.toSeq === texts.map(refPolyHash(_, 31L, TextHash.P)))
  }

  test("polyHash handles non-ASCII codepoints like ascii()-per-char") {
    val texts = Seq("héllo", "日本語テキスト", "mixed ascii и кириллица", "")
    val got = texts.toDF("s")
      .select(TextHash.polyHash($"s").as("h")).collect().map(_.getLong(0))
    assert(got.toSeq === texts.map(refPolyHash(_, 31L, TextHash.P)))
  }

  test("gramHashes equals per-position reference hashes") {
    val k = 8
    val texts = randomTexts(100, seed = 2)
    val got = texts.toDF("s")
      .select(TextHash.gramHashes($"s", k).as("g"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val want = texts.map { t =>
      val cps = t.codePoints().toArray
      (0 to cps.length - k).map(i =>
        cps.slice(i, i + k).foldLeft(0L)((acc, cp) => acc * 31L + cp)).toSeq
    }
    assert(got.toSeq === want)
  }

  test("shingleHashes equals tokenize-hash-combine reference") {
    val texts = randomTexts(100, seed = 3) :+ "  " :+ "one two" :+ "a b c d"
    val got = texts.toDF("s")
      .select(TextHash.shingleHashes($"s").as("g"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val want = texts.map { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val th = toks.map(refPolyHash(_, 31L, TextHash.P))
      th.sliding(3).filter(_.length == 3).map(w =>
        java.lang.Math.floorMod(
          java.lang.Math.floorMod(w(0) * 31L + w(1), TextHash.P) * 31L + w(2),
          TextHash.P)).toSeq
    }
    assert(got.toSeq === want)
  }

  test("winnowMins equals the window-min + distinct reference") {
    val rng = new java.util.Random(7)
    // arrays shorter than, equal to, and longer than the window, with
    // duplicate values to exercise the per-doc distinct and ties
    val arrays = Seq.fill(200) {
      val len = rng.nextInt(60)
      (0 until len).map(_ => rng.nextInt(12).toLong)
    } :+ Seq.empty[Long] :+ Seq(5L) :+ Seq.fill(40)(3L)
    for (w <- Seq(1, 2, 16)) {
      val got = arrays.toDF("a")
        .select(TextHash.winnowMins($"a", w).as("m"))
        .collect().map(_.getSeq[Long](0).toSeq)
      val want = arrays.map { a =>
        val n = a.length
        (0 until n).map(i => a.slice(i, math.min(i + w, n)).min)
          .distinct.sorted
      }
      assert(got.toSeq === want, s"w=$w")
    }
  }

  test("native dot equals the zip_with/aggregate fold bitwise") {
    val rng = new java.util.Random(5)
    val vecs = Seq.fill(30)((Array.fill(64)(rng.nextGaussian()),
      Array.fill(64)(rng.nextGaussian())))
    val df = vecs.toDF("a", "b")
    val native = df.select(graft.operators.Similarity.dot($"a", $"b"))
      .collect().map(_.getDouble(0))
    val hof = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
      .collect().map(_.getDouble(0))
    assert(native.toSeq === hof.toSeq) // exact, not approximate
  }
}
