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
}
