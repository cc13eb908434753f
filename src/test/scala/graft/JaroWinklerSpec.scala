package graft

import graft.functions.JaroWinklerExpr
import org.apache.spark.unsafe.types.UTF8String

/** Pins JaroWinklerExpr to the published algorithm's canonical values
  * (the same ones DuckDB's jaro_winkler_similarity returns — verified
  * against it empirically; q118's oracle is the cross-engine check).
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical Winkler triples") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
  }

  test("edge cases: empty, equal, window-0, symmetric") {
    assert(jw("", "") === 0.0)       // DuckDB convention: empty → 0
    assert(jw("a", "") === 0.0)
    assert(jw("same", "same") === 1.0)
    assert(jw("ab", "ba") === 0.0)   // window max(2,2)/2-1 = 0
    assert(jw("x", "y") === 0.0)
    assert(jw("DIXON", "DICKSONX") === jw("DICKSONX", "DIXON"))
  }

  test("boost threshold 0.7: no prefix bonus at or below it") {
    // jaro = 0.5556 < 0.7, common 2-char prefix gets NO bonus
    assert(math.abs(jw("abcdef", "abzzzz") - 0.5555555555555555) < 1e-15)
    // jaro > 0.7 with a 6-char common prefix: bonus capped at 4 chars
    assert(math.abs(jw("prefix_common", "prefix_zzzzz") - 0.8243589743589744) < 1e-12)
  }

  test("integer transposition halving (odd mismatch count)") {
    // matched sequences abcdef vs cabdef: 3 mismatched positions,
    // trans = 3/2 = 1 (integer) -> jaro (1+1+(6-1)/6)/3
    assert(math.abs(jw("abcdef", "cabdef") - 0.9444444444444445) < 1e-15)
  }

  test("column API runs codegen'd over a DataFrame") {
    val out = Seq(("MARTHA", "MARHTA"), ("ab", "ba"))
      .toDF("a", "b")
      .select(JaroWinklerExpr.jaroWinkler(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("jw"))
      .collect().map(_.getDouble(0)).sorted
    assert(out(0) === 0.0)
    assert(math.abs(out(1) - 0.9611111111111111) < 1e-15)
  }
}
