package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, GramHashesExpr, PolyHashExpr,
  ShingleHashesExpr, TextHash}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_poly_hash(text) ...")` works alongside
  * the Column API:
  *
  *  - `GraftFunctions.register(spark)` on a live session, or
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` at deploy.
  *
  * Literal numeric arguments (base/mod/k) are folded at registration
  * time — they must be literals, mirroring how the Column API fixes
  * them per call site.
  */
object GraftFunctions {

  private def longArg(e: Expression): Long =
    e.eval(null) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"literal integer argument expected, got $other")
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHashExpr].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => PolyHashExpr(s, 31L, TextHash.P)
        case Seq(s, b, m) => PolyHashExpr(s, longArg(b), longArg(m))
        case _ => throw new IllegalArgumentException(
          "graft_poly_hash(str[, base, mod])")
      }),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => ShingleHashesExpr(s, 3, 31L, TextHash.P)
        case Seq(s, n) => ShingleHashesExpr(s, longArg(n).toInt, 31L, TextHash.P)
        case _ => throw new IllegalArgumentException("graft_shingle_hashes(str[, n])")
      }),
    (FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashesExpr].getName, "graft_gram_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(s, k) => GramHashesExpr(s, longArg(k).toInt, 31L)
        case _ => throw new IllegalArgumentException("graft_gram_hashes(str, k)")
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProductExpr(a, b)
        case _ => throw new IllegalArgumentException("graft_dot(a, b)")
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerExpr].getName,
        "graft_jaro_winkler"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.JaroWinklerExpr(a, b)
        case _ => throw new IllegalArgumentException("graft_jaro_winkler(a, b)")
      }),
    (FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShinglesExpr].getName,
        "graft_word_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(s, n) => graft.functions.WordShinglesExpr(s, longArg(n).toInt)
        case _ => throw new IllegalArgumentException("graft_word_shingles(str, n)")
      })
  )

  /** Register every graft function on a live session — the scalar
    * native expressions plus the sketch UDAFs (typed Aggregators
    * exposed through `functions.udaf`, so `spark.sql` callers get the
    * same bounded-state partial aggregates as the Column API).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftshim.ColumnBridge
        .registerFunction(spark, id, info, builder)
    }
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("graft_kmv",
      udaf(new graft.functions.KmvSketch(64, TextHash.P),
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong)))
    spark.udf.register("graft_heavy_hitters",
      udaf(new graft.functions.MgSketch(1 << 16),
        Encoders.tuple(Encoders.STRING, Encoders.STRING)))
    spark.udf.register("graft_sample",
      udaf(new graft.functions.HashReservoir(10),
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)))
  }
}

/** `spark.sql.extensions` entry point (scalar expressions; the sketch
  * UDAFs bind to a live session via `GraftFunctions.register` because
  * `udaf()` wraps a session-bound ScalaAggregator).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
