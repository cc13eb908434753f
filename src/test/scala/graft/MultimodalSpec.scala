package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def withDocsDir(texts: Seq[String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    try {
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("mediaMeta: bytes, first byte, checksum, frame count match hand computation") {
    val t = "abc" * 30 // 90 bytes -> 3 frames at stride 32
    withDocsDir(Seq(t)) { dir =>
      val r = Multimodal.mediaMeta(spark, dir).head()
      assert(r.getAs[Long]("n_bytes") === 90L)
      assert(r.getAs[Int]("first_byte") === 'a'.toInt)
      assert(r.getAs[Long]("checksum") === t.map(_.toInt.toLong).sum)
      assert(r.getAs[Long]("n_frames") === 3L)
    }
  }

  test("frameSamples: stride-aligned bytes in order") {
    val t = ("x" * 32) + ("y" * 32) + "z"
    withDocsDir(Seq(t)) { dir =>
      val rows = Multimodal.frameSamples(spark, dir)
        .orderBy("frame_idx").collect()
      assert(rows.map(_.getAs[Long]("frame_idx")).toSeq === Seq(0L, 1L, 2L))
      assert(rows.map(_.getAs[Int]("byte_val")).toSeq ===
        Seq('x'.toInt, 'y'.toInt, 'z'.toInt))
    }
  }

  test("mediaTable carries an opaque binary column with typed metadata") {
    withDocsDir(Seq("hello")) { dir =>
      val df = Multimodal.mediaTable(spark, dir)
      val schema = df.schema
      assert(schema("media").dataType.typeName === "binary")
      assert(schema("media_meta").dataType.typeName === "struct")
      val bytes = df.head().getAs[Array[Byte]]("media")
      assert(new String(bytes, "UTF-8") === "hello")
    }
  }

  test("resizeSamples: nearest-neighbor down- and up-sampling, empty blobs dropped") {
    // "abcd" (n=4) to target 16: src = i*4/16 = i/4 -> each byte ×4
    withDocsDir(Seq("abcd", "")) { dir =>
      val out = Multimodal.resizeSamples(spark, dir).orderBy("doc_id", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(out.length === 16) // empty doc contributes nothing
      assert(out.map(_._3).toSeq ===
        "abcd".flatMap(c => Seq.fill(4)(c.toInt)))
      // downsample: 64 bytes -> 16 takes every 4th byte
      val long = (0 until 64).map(i => ('a' + i % 26).toChar).mkString
      withDocsDir(Seq(long)) { d2 =>
        val ds = Multimodal.resizeSamples(spark, d2).orderBy("pos")
          .collect().map(_.getInt(2))
        assert(ds.toSeq === (0 until 16).map(i => long(i * 4).toInt))
      }
    }
  }

  test("decodeStub: deterministic fixed-width features; empty input safe") {
    val f = Multimodal.decodeStub("ab".getBytes("UTF-8"))
    assert(f.toSeq === Seq((97 + 98) / 2f, 98f, 2f, 97f))
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq === Seq(0f, 0f, 0f, 0f))
    // features flow through the batched pipeline
    withDocsDir(Seq("ab", "cd")) { dir =>
      val out = Multimodal.decodeFeatures(spark, dir).orderBy("doc_id").collect()
      assert(out.length === 2)
      assert(out(0).getSeq[Float](1).length === 4)
    }
  }

  test("phashBands: identical blobs hash equal, near-dups land in a shared band, " +
    "unrelated blobs stay apart") {
    // Blob A and its "re-encoding" B differ in ONE sampled position —
    // dHash flips at most 2 bits -> at least 3 of 4 bands still match.
    // Blob C is a byte-reversed A (different structure everywhere).
    val a = (0 until 130).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val b = { val sb = new StringBuilder(a); sb.setCharAt(4, 'z'); sb.toString }
    val c = a.reverse
    withDocsDir(Seq(a, a, b, c, "")) { dir =>
      val rows = Multimodal.phashBands(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      // exact copy: identical signature, hamming 0 to its twin
      assert(rows(0L).getAs[Long]("ph_lo") === rows(1L).getAs[Long]("ph_lo"))
      assert(rows(0L).getAs[Long]("ph_hi") === rows(1L).getAs[Long]("ph_hi"))
      assert(rows(0L).getAs[Long]("min_hamming") === 0L)
      // near-dup: banding surfaces it as a candidate with small hamming
      assert(rows(2L).getAs[Long]("n_band_neighbors") >= 2L)
      assert(rows(2L).getAs[Long]("min_hamming") <= 3L)
      // empty blob: null signature, no banding
      assert(rows(4L).isNullAt(rows(4L).fieldIndex("ph_lo")))
      assert(rows(4L).getAs[Long]("n_band_neighbors") === 0L)
    }
  }

  test("sceneCuts: cuts at signature jumps, shots are maximal runs, exact rollups") {
    // frame bytes come from positions 0, 32, 64, 96: craft a 97-char
    // text with 'a'(97), 'a'(97), ' '(32), 'z'(122) there ->
    // deltas 0, -65, +90 vs threshold 48 -> cuts before frames 2 and
    // 3 -> shots [0,1], [2], [3]
    val t = new StringBuilder("b" * 97)
    t.setCharAt(0, 'a'); t.setCharAt(32, 'a')
    t.setCharAt(64, ' '); t.setCharAt(96, 'z')
    withDocsDir(Seq(t.toString)) { dir =>
      val rows = Multimodal.sceneCuts(spark, dir).collect()
        .map(r => r.getAs[Long]("shot_id") ->
          ((r.getAs[Long]("start_frame"), r.getAs[Long]("end_frame"),
            r.getAs[Long]("n_frames"), r.getAs[Long]("sum_sig")))).toMap
      assert(rows === Map(
        0L -> ((0L, 1L, 2L, 194L)),  // 97 + 97
        1L -> ((2L, 2L, 1L, 32L)),   // the space frame
        2L -> ((3L, 3L, 1L, 122L)))) // 'z'
      // a single-frame blob is one shot with no cuts
      withDocsDir(Seq("x")) { d2 =>
        val one = Multimodal.sceneCuts(spark, d2).collect()
        assert(one.length === 1)
        assert(one.head.getAs[Long]("n_frames") === 1L)
        assert(one.head.getAs[Long]("sum_sig") === 'x'.toLong)
      }
    }
  }

  test("loudnessStats: exact power sums, peak, and gain on a crafted blob") {
    // "`ab" -> centered samples 0, 1, 2: ss=5, peak=2, rms=sqrt(5/3)
    withDocsDir(Seq("`ab", "")) { dir =>
      val rows = Multimodal.loudnessStats(spark, dir).collect()
      assert(rows.length === 1) // empty blob emits nothing
      val r = rows.head
      assert(r.getAs[Long]("n_samples") === 3L)
      assert(r.getAs[Long]("peak") === 2L)
      val rms = math.sqrt(5.0 / 3)
      assert(math.abs(r.getAs[Double]("rms") - rms) < 1e-12)
      assert(math.abs(r.getAs[Double]("gain") - 20.0 / rms) < 1e-12)
      assert(math.abs(r.getAs[Double]("crest") - 2.0 / rms) < 1e-12)
    }
  }

  test("speechSegments: active runs merge, silence splits, partial tail frame counts") {
    // frames (16 chars): v=16 | v=0 | v=5 | v=5 (5-char tail)
    // active (>=5): 0, 2, 3 -> segments [0,0] and [2,3]
    val text = "aeiouaeiouaeioua" + "bcdfgbcdfgbcdfgb" +
      "aaaaabbbbbbbbbbb" + "eeeee"
    withDocsDir(Seq(text)) { dir =>
      val segs = Multimodal.speechSegments(spark, dir).collect()
        .map(r => (r.getAs[Long]("start_frame"), r.getAs[Long]("end_frame"),
          r.getAs[Long]("n_frames"), r.getAs[Long]("sum_voiced"))).toSet
      assert(segs === Set((0L, 0L, 1L, 16L), (2L, 3L, 2L, 10L)))
      // an all-silence blob yields no segments at all
      withDocsDir(Seq("bcdf " * 10)) { d2 =>
        assert(Multimodal.speechSegments(spark, d2).count() === 0L)
      }
    }
  }
}
