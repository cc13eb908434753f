package graft

import org.apache.spark.sql.types._
import graft.sources.GenericSources

class GenericSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def withTmp(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("gsrc").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("CSV roundtrip with declared schema (no inference pass)") {
    withTmp { dir =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/in.csv"),
        "id,name,score\n1,alpha,1.5\n2,beta,-0.25\n")
      val df = GenericSources.readCsv(spark, s"$dir/in.csv", schema)
      // file sources force nullable=true; names and types must match
      assert(df.schema.map(f => (f.name, f.dataType)) ===
        schema.map(f => (f.name, f.dataType)))
      val rows = df.orderBy("id").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
        === Seq((1L, "alpha", 1.5), (2L, "beta", -0.25)))
    }
  }

  test("JSONL roundtrip with declared schema") {
    withTmp { dir =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/in.jsonl"),
        """{"id":1,"name":"alpha","score":1.5}
          |{"id":2,"name":null,"score":0.0}
          |""".stripMargin)
      val df = GenericSources.readJsonl(spark, s"$dir/in.jsonl", schema)
      val rows = df.orderBy("id").collect()
      assert(rows.length === 2)
      assert(rows(1).isNullAt(1))
    }
  }

  test("parquet writer partitions by the given key") {
    withTmp { dir =>
      val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
      GenericSources.writeParquet(df, s"$dir/out", partitionBy = Seq("name"))
      val back = spark.read.parquet(s"$dir/out")
      assert(back.count() === 2)
      assert(new java.io.File(s"$dir/out/name=a").isDirectory)
    }
  }

  test("partition filter prunes at the scan: only the matching directory is read") {
    withTmp { dir =>
      val df = (0 until 100).map(i => (i.toLong, s"day${i % 5}", i.toDouble))
        .toDF("id", "day", "v")
      GenericSources.writeParquet(df, s"$dir/out", partitionBy = Seq("day"))
      val back = spark.read.parquet(s"$dir/out").filter($"day" === "day3")
      assert(back.count() === 20)
      val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
      // the predicate must land in PartitionFilters (directory pruning),
      // not PushedFilters (row-group skipping) — at 100 TB this is the
      // difference between listing 1/5 of the files and reading them all
      assert(scan.contains("PartitionFilters"), scan)
      assert(scan.replaceAll("(?s)PushedFilters.*", "").contains("day3"),
        s"partition predicate not pruned at the scan:\n$scan")
    }
  }

  test("ORC roundtrip: summary over the ORC copy equals the parquet original") {
    withTmp { dir =>
      Seq((0L, "hello world", "en", "web", 11L),
          (1L, "bonjour", "fr", "web", 7L),
          (2L, "ciao", "it", "books", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = GenericSources.orcRoundtripSummary(spark, dir).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
            r.getAs[Long]("sum_text_len")))).toMap
      assert(out(("web", "en")) === ((1L, 11L, 11L)))
      assert(out(("web", "fr")) === ((1L, 7L, 7L)))
      assert(out(("books", "it")) === ((1L, 4L, 4L)))
    }
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    withTmp { dir =>
      val df = (0 until 100).map(i => (i.toLong, s"t$i", i % 7))
        .toDF("id", "text", "grp")
      GenericSources.writeOrc(df, s"$dir/orc")
      val back = GenericSources.readOrc(spark, s"$dir/orc")
        .filter($"grp" === 3).select("id")
      val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PushedFilters: [IsNotNull(grp), EqualTo(grp,3)]"), scan)
      // column pruning: the text payload must not be read
      assert(!scan.replaceAll("(?s)Location.*", "").contains("text"),
        s"ORC scan reads the unprojected text column:\n$scan")
    }
  }

  test("text-source roundtrip: tab framing survives; summary matches hand rollup") {
    withTmp { dir =>
      Seq((3L, "abc def", "en", "web", 7L), (10L, "xyzzy", "en", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = GenericSources.textRoundtripSummary(spark, dir).collect()
        .map(r => r.getAs[Long]("len_mod7") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_len"),
            r.getAs[Long]("sum_ids"), r.getAs[Long]("min_id"),
            r.getAs[Long]("max_id")))).toMap
      // "abc def" len 7 -> mod 0; "xyzzy" len 5 -> mod 5
      assert(out === Map(0L -> ((1L, 7L, 3L, 3L, 3L)),
        5L -> ((1L, 5L, 10L, 10L, 10L))))
    }
  }

  test("binaryFile ingest: one file per blob, exact byte checksums") {
    withTmp { dir =>
      Seq((1L, "ab", "en", "web", 2L), (2L, "c", "en", "web", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = GenericSources.binaryFilesSummary(spark, dir).collect()
        .map(r => r.getAs[Long]("len_mod5") ->
          ((r.getAs[Long]("n_files"), r.getAs[Long]("sum_bytes"),
            r.getAs[Long]("sum_checksum"), r.getAs[Long]("sum_ids")))).toMap
      // "ab" -> 97+98=195 (len 2); "c" -> 99 (len 1)
      assert(out === Map(2L -> ((1L, 2L, 195L, 1L)),
        1L -> ((1L, 1L, 99L, 2L))))
    }
  }
}
