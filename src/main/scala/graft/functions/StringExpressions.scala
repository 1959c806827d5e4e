package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
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

/** char_kgrams(text, k): every length-k character substring of `text`, in
  * position order — `[substr(1,k), substr(2,k), …, substr(n-k+1,k)]`, with
  * the whole text as the single element when it is shorter than k
  * (`substr`'s clamping rule, so this is drop-in for the
  * `transform(sequence(…), i -> substr(i, k))` formulation).
  *
  * Why native: `Column.substr(i, k)` re-scans the string from byte 0 to
  * find character offset i on EVERY call — the composed form is O(len²)
  * per document and measured as the dominant cost of every character-gram
  * operator (dup spans, winnowing, n-gram dedup). This walks the UTF-8
  * byte offsets ONCE and slices grams by byte range: O(len·k), identical
  * output strings (character semantics preserved for multi-byte text). */
case class CharKGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char_kgrams needs k >= 1, got $k")

  override def prettyName: String = "char_kgrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    CharKGrams.compute(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharKGrams.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharKGrams {
  /** One pass: record each character's byte offset, then slice grams by
    * byte range. Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array[Any](s.clone()))
    val offs = new Array[Int](n + 1)
    var i = 0
    var c = 0
    while (c < n) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(n) = bytes.length
    val out = new Array[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      out(p) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(p), offs(p + k)))
      p += 1
    }
    new GenericArrayData(out)
  }
}
