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
}
