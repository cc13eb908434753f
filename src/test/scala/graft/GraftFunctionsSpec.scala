package graft

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val h = spark.sql("SELECT graft_poly_hash('abc') AS h").head().getLong(0)
    val want = Seq('a', 'b', 'c').foldLeft(0L)((acc, c) =>
      (acc * 31 + c.toInt) % graft.functions.TextHash.P)
    assert(h === want)

    val sh = spark.sql("SELECT graft_shingle_hashes('a b c d') AS s")
      .head().getSeq[Long](0)
    assert(sh.length === 2)

    val g = spark.sql("SELECT graft_gram_hashes('abcdefghij', 8) AS g")
      .head().getSeq[Long](0)
    assert(g.length === 3)

    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d === 11.0)

    val jw = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw").head().getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-15)

    val ws = spark.sql("SELECT graft_word_shingles('a b c d', 2) AS w")
      .head().getSeq[String](0)
    assert(ws === Seq("a b", "b c", "c d"))
  }

  test("explicit base/mod arguments work; non-literal args are rejected") {
    GraftFunctions.register(spark)
    val h = spark.sql("SELECT graft_poly_hash('a', 1, 1000) AS h")
      .head().getLong(0)
    assert(h === 97L)
    intercept[Exception] {
      spark.sql("SELECT graft_poly_hash('a', 'x', 7)").collect()
    }
  }

  test("sketch UDAFs are callable from SQL and match the typed API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("web", 5L), ("web", 3L), ("web", 5L), ("books", 9L))
      .toDF("source", "h").createOrReplaceTempView("hashes")
    val kmv = spark.sql(
      """SELECT source, graft_kmv(source, h) AS sk FROM hashes GROUP BY source
        |""".stripMargin)
      .selectExpr("source", "sk.n_kept", "sk.est_distinct")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(kmv("web") === ((2, 2.0)))   // {5,3}: exact below saturation
    assert(kmv("books") === ((1, 1.0)))

    Seq(("web", "a"), ("web", "a"), ("web", "b"))
      .toDF("source", "token").createOrReplaceTempView("toks")
    val hh = spark.sql(
      "SELECT graft_heavy_hitters(source, token) AS s FROM toks GROUP BY source")
      .selectExpr("inline(s)").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh === Map("a" -> 2L, "b" -> 1L))

    Seq(("web", 7L, 1L), ("web", 2L, 2L), ("web", 5L, 3L))
      .toDF("source", "h", "doc_id").createOrReplaceTempView("samp")
    val ids = spark.sql(
      "SELECT graft_sample(source, h, doc_id) AS s FROM samp GROUP BY source")
      .selectExpr("inline(s)").collect().map(_.getLong(1)).toSeq
    assert(ids === Seq(2L, 3L, 1L)) // ordered by hash: 2<5<7
  }
}
