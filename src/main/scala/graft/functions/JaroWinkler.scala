package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd Catalyst
  * expression — the record-linkage scorer (Winkler 1990, building on
  * Jaro 1989) Spark lacks as a builtin (it ships only levenshtein).
  *
  * Semantics pinned to the published algorithm as DuckDB's
  * `jaro_winkler_similarity` executes it (verified empirically on the
  * canonical MARTHA/MARHTA, DIXON/DICKSONX, DWAYNE/DUANE triples and
  * edge cases):
  *   - either string empty → 0.0 (including both empty);
  *   - match window = max(|a|,|b|)/2 − 1, floored at 0 (so "ab"/"ba"
  *     matches nothing);
  *   - transpositions halved with INTEGER division;
  *   - Winkler prefix bonus `jw = j + ℓ·0.1·(1−j)` applied only when
  *     jaro > 0.7, common prefix ℓ capped at 4.
  *
  * A Scala UDF computing the same would serialize each UTF8String to
  * a JVM String per row and fall out of whole-stage codegen; this
  * expression participates via a static-call defineCodeGen like the
  * [[PolyHashExpr]] family. Comparison is by UTF-16 code unit —
  * identical to codepoint comparison on BMP text (the corpus here is
  * ASCII).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinklerExpr(expression(a), expression(b)))

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.toString
    val t = ub.toString
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sm = new Array[Boolean](ls)
    val tm = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val c = s.charAt(i)
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && t.charAt(j) == c) {
          sm(i) = true; tm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(ls, lt))
    while (l < lmax && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
