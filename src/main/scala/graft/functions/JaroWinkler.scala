package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Jaro-Winkler string similarity as a codegen'd expression — the fuzzy
  * equality operator behind entity resolution / record linkage. Textbook
  * semantics with the standard 0.7 boost threshold, chosen to match DuckDB's
  * `jaro_winkler_similarity` bit-for-bit on every probe in JaroWinklerSpec
  * (prefix weight 0.1, prefix cap 4, boost only when jaro > 0.7, match
  * window max(|a|,|b|)/2 - 1, transpositions = half the out-of-order
  * matches) — which is what lets fuzzy-match queries be hash-oracled.
  *
  * A Scala UDF computing the same thing would break whole-stage codegen at
  * every call site; this stays inside the generated loop like the other
  * graft expressions. O(|a| x window) time, two small boolean scratch
  * arrays. Null if either side is null.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires string inputs, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.compute($a.toString(), $b.toString())")

  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Jaro similarity, then the Winkler prefix boost above 0.7. Identical
    * arithmetic ORDER to the reference formula — (m/l1 + m/l2 + (m-t)/m)/3
    * left-to-right — so the value agrees with DuckDB's across the oracle
    * boundary (validated case-by-case in JaroWinklerSpec). */
  def compute(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val cap = math.min(4, math.min(l1, l2))
    while (p < cap && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
