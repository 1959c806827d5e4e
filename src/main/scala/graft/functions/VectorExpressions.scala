package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over embedding columns (`array<float>`/`array<double>`).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * CodegenFallback — every element bounces through interpreted expression
  * eval. These are proper Catalyst `BinaryExpression`s with `doGenCode`, so
  * the similarity kernels run as tight JIT'd loops inside whole-stage
  * codegen. Semantics match the HOF path bit-for-bit: elements upcast to
  * double, sequential left-to-right accumulation, and NULL when the array
  * lengths differ (the HOF `zip_with` null-pads the shorter array, which
  * propagates NULL through the fold — the native path mirrors that instead
  * of silently summing over min(len)).
  *
  * Registered as SQL functions `vec_dot` / `cosine_sim` by
  * [[graft.GraftExtensions]].
  */
trait VectorFoldExpression extends BinaryExpression {

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  /** NULL can arise from NON-null inputs (length mismatch, null element).
    * The BinaryExpression default — nullable iff a child is nullable — would
    * let Spark trust a non-null schema and read the slot as 0.0 instead of
    * NULL when both children are non-nullable literals/computed arrays. */
  override def nullable: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** element types resolved ONCE, not re-dispatched per element in the
    * interpreted loop */
  @transient protected lazy val leftIsFloat: Boolean = elemIsFloat(left)
  @transient protected lazy val rightIsFloat: Boolean = elemIsFloat(right)

  /** java accessor for one element of the given child. */
  protected def getter(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def readElem(isFloat: Boolean, arr: ArrayData, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** vec_dot(a, b): Σ a_i·b_i; null if the lengths differ or any element is
  * null (matches the HOF zip_with/aggregate fold). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += readElem(leftIsFloat, x, i) * readElem(rightIsFloat, y, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  ${ev.value} += (${getter(left, a, i)}) * (${getter(right, b, i)});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** vec_norm(a): sqrt(Σ a_i²) in ONE fused pass — the `sqrt(vec_dot(v,v))`
  * idiom every similarity scan pays per row costs an extra array traversal
  * plus a second null/length check; this folds square-accumulate and sqrt
  * into a single loop. NULL on a null element (same contract as the fold).
  * IEEE-identical to sqrt(vec_dot(v,v)): same sequential accumulation, one
  * final sqrt — so swapping it into an oracled query cannot move a hash. */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType

  /** NULL on a null element even when the input array itself is
    * non-nullable — same rationale as [[VectorFoldExpression.nullable]]. */
  override def nullable: Boolean = true

  /** resolved once, not re-dispatched per element in the interpreted loop
    * (same rationale as [[VectorFoldExpression.leftIsFloat]]) */
  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $get; $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine_sim(a, b): vec_dot(a,b) / (sqrt(vec_dot(a,a)) · sqrt(vec_dot(b,b))),
  * all three accumulators in ONE fused pass over the pair. Each accumulator
  * still adds its terms in element order, so the result is IEEE-identical
  * to the separate-loop form — fusing moves no bits, it only drops two
  * array traversals and their redundant null re-checks. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = readElem(leftIsFloat, x, i)
      val yv = readElem(rightIsFloat, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |  else {
         |    double $xv = ${getter(left, a, i)};
         |    double $yv = ${getter(right, b, i)};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
