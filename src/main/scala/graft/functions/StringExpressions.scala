package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static string-similarity kernels shared by the interpreted and
  * generated-code paths of the native expressions below (the same
  * one-static-method pattern Spark's own `levenshtein` uses via
  * `UTF8String.levenshteinDistance`). */
object StringSimilarity {

  /** Jaro-Winkler similarity in [0, 1] — the record-linkage scorer for
    * short identifier strings (names, codes), complementing the built-in
    * `levenshtein` for typo-distance. Standard parameters, chosen to match
    * DuckDB's `jaro_winkler_similarity` exactly (verified empirically:
    * match window = max(len)/2 − 1 clamped to ≥ 0, transpositions = half
    * the out-of-order matched pairs, Winkler prefix boost 0.1·l·(1−jaro)
    * applied only when jaro > 0.7 with the common prefix l capped at 4),
    * so a DuckDB oracle can replay scores bit-for-bit before rounding.
    * Either side empty → 0. Works on UTF-16 code units — identical to
    * byte-wise for the ASCII identifiers this targets. */
  def jaroWinkler(ls: UTF8String, rs: UTF8String): Double = {
    val a = ls.toString
    val b = rs.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val amatch = new Array[Boolean](la)
    val bmatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val jLo = math.max(0, i - window)
      val jHi = math.min(lb - 1, i + window)
      var j = jLo
      var found = false
      while (j <= jHi && !found) {
        if (!bmatch(j) && a.charAt(i) == b.charAt(j)) {
          amatch(i) = true; bmatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order of appearance
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (amatch(i)) {
        while (!bmatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** jaro_winkler(a, b): native codegen Jaro-Winkler similarity — a tight
  * static-method call inside whole-stage codegen, never a UDF closure.
  * NULL-safe via the standard BinaryExpression contract (null in → null
  * out). Registered as SQL function `jaro_winkler` by
  * [[graft.GraftExtensions]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimilarity.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
