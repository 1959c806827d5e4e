package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native product-quantization kernels ([[graft.ext.Pq]]).
  *
  * The composed-expression formulation (one `vec_dot` slice per codeword —
  * m × ksub = 64 sub-expressions at the default geometry) is correct but
  * pays its cost at PLAN time: Catalyst carries a 64-branch tree through
  * analysis/optimization and whole-stage codegen compiles it into a
  * method-limit-straining body per operator (measured: ~5 s of the
  * topk_sim_pq constant is planning+codegen, data size irrelevant). These
  * expressions collapse each kernel into ONE loop over the codebook
  * literals carried as plain double[] references — tiny plan, tiny
  * generated method, same arithmetic.
  *
  * Bit-parity contract (the DuckDB oracle replays the composed form):
  * element j of subspace s is vec[s·dsub + j] upcast to double; dots
  * accumulate left-to-right; assignment score is cc − 2.0·dot with the
  * driver-precomputed cc; ties take the smaller code (the `array_min`
  * struct-lexicographic rule). NULL when the vector is NULL, an element is
  * NULL, or the vector is shorter than m·dsub. Score comparisons use
  * Spark's SQL double ordering (NaN greatest, ±0.0 equal — the ordering
  * behind array_min/array_max), NOT the Java primitive `<`/`>` whose
  * always-false NaN comparisons would diverge from the composed forms on
  * NaN-scored inputs.
  */
trait PqKernelExpression extends UnaryExpression {
  def ksub: Int
  def dsub: Int
  /** flattened codebooks: codeword k of subspace s starts at (s·ksub+k)·dsub */
  def cb: Array[Double]
  protected def m: Int = cb.length / (ksub * dsub)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> vector, got ${dt.simpleString}")
  }
  override def nullable: Boolean = true

  @transient protected lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def readElem(x: ArrayData, i: Int): Double =
    if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
  protected def getterJava(arr: String, i: String): String =
    if (elemIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Spark's SQL double ordering (SQLOrderingUtil.compareDoubles): `==` first
  * so ±0.0 compare equal, then java.lang.Double.compare so NaN sorts
  * greatest (and NaN == NaN) — the ordering array_min/array_max use. */
private[functions] object SqlDoubleOrder {
  def compare(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)
  /** Java source of the same comparison, for codegen. */
  def javaSrc(x: String, y: String): String =
    s"(($x == $y) ? 0 : Double.compare($x, $y))"
}

/** pq_codes(vec): the m positional codes of the L2-nearest codeword per
  * subspace — argmin over codewords of (c·c − 2·x·c). */
case class PqCodes(child: Expression, cb: Array[Double], cc: Array[Double],
                   ksub: Int, dsub: Int) extends PqKernelExpression {
  override def prettyName: String = "pq_codes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestCode = 0
      var k = 0
      while (k < ksub) {
        var dot = 0.0
        val base = (s * ksub + k) * dsub
        var j = 0
        while (j < dsub) {
          if (x.isNullAt(s * dsub + j)) return null
          dot += readElem(x, s * dsub + j) * cb(base + j)
          j += 1
        }
        val score = cc(s * ksub + k) - 2.0 * dot
        if (SqlDoubleOrder.compare(score, best) < 0) { best = score; bestCode = k }
        k += 1
      }
      codes(s) = bestCode
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
      val ccRef = ctx.addReferenceObj("pqCc", cc, "double[]")
      val codes = ctx.freshName("codes")
      val (s, k, j) = (ctx.freshName("s"), ctx.freshName("k"), ctx.freshName("j"))
      val (best, bc, dot, sc) = (ctx.freshName("best"), ctx.freshName("bc"),
        ctx.freshName("dot"), ctx.freshName("sc"))
      s"""
         |if ($a.numElements() < ${m * dsub}) { ${ev.isNull} = true; } else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    double $best = Double.POSITIVE_INFINITY; int $bc = 0;
         |    for (int $k = 0; $k < $ksub && !${ev.isNull}; $k++) {
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        if ($a.isNullAt($s * $dsub + $j)) { ${ev.isNull} = true; break; }
         |        $dot += (${getterJava(a, s"$s * $dsub + $j")}) * $cbRef[($s * $ksub + $k) * $dsub + $j];
         |      }
         |      double $sc = $ccRef[$s * $ksub + $k] - 2.0 * $dot;
         |      if (${SqlDoubleOrder.javaSrc(sc, best)} < 0) { $best = $sc; $bc = $k; }
         |    }
         |    $codes[$s] = $bc;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_dot_table(vec): the query's ADC lookup table — dot(sub_s(vec), c)
  * for every subspace s and codeword c, flattened s-major (the exact
  * element order of the composed `array(vec_dot(slice...))` form). */
case class PqDotTable(child: Expression, cb: Array[Double],
                      ksub: Int, dsub: Int) extends PqKernelExpression {
  override def prettyName: String = "pq_dot_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < m * dsub) return null
    val dt = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var k = 0
      while (k < ksub) {
        var dot = 0.0
        val base = (s * ksub + k) * dsub
        var j = 0
        while (j < dsub) {
          if (x.isNullAt(s * dsub + j)) return null
          dot += readElem(x, s * dsub + j) * cb(base + j)
          j += 1
        }
        dt(s * ksub + k) = dot
        k += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(dt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
      val dt = ctx.freshName("dt")
      val (s, k, j, dot) = (ctx.freshName("s"), ctx.freshName("k"),
        ctx.freshName("j"), ctx.freshName("dot"))
      s"""
         |if ($a.numElements() < ${m * dsub}) { ${ev.isNull} = true; } else {
         |  double[] $dt = new double[${m * ksub}];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    for (int $k = 0; $k < $ksub && !${ev.isNull}; $k++) {
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        if ($a.isNullAt($s * $dsub + $j)) { ${ev.isNull} = true; break; }
         |        $dot += (${getterJava(a, s"$s * $dsub + $j")}) * $cbRef[($s * $ksub + $k) * $dsub + $j];
         |      }
         |      $dt[$s * $ksub + $k] = $dot;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($dt);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nearest_cell(vec): id of the centroid with max dot(vec, centroid) —
  * the k-means / IVF assignment kernel. Centroids arrive pre-unitized and
  * flattened (centroid i spans cents[i·dim, (i+1)·dim)), with `cells(i)`
  * its id. Ties take the LARGER cell id — the `array_max` struct-
  * lexicographic rule of the composed form this replaces (one vec_dot
  * struct per centroid, whose per-iteration analysis+codegen cost
  * dominated the k-means paths the way the PQ tree did topk_sim_pq).
  * Same arithmetic: left-to-right double accumulation per centroid; dot
  * comparisons use [[SqlDoubleOrder]] so NaN dots pick the largest cell id,
  * exactly as the composed array_max form does. */
case class NearestCell(child: Expression, cents: Array[Double],
                       cells: Array[Int], dim: Int) extends UnaryExpression {
  override def prettyName: String = "nearest_cell"
  private def k: Int = cells.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> vector, got ${dt.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < dim) return null
    var best = Double.NegativeInfinity
    var bestCell = Int.MinValue
    var i = 0
    while (i < k) {
      var dot = 0.0
      var j = 0
      while (j < dim) {
        if (x.isNullAt(j)) return null
        val v = if (elemIsFloat) x.getFloat(j).toDouble else x.getDouble(j)
        dot += v * cents(i * dim + j)
        j += 1
      }
      val cmp = SqlDoubleOrder.compare(dot, best)
      if (cmp > 0 || (cmp == 0 && cells(i) > bestCell)) {
        best = dot; bestCell = cells(i)
      }
      i += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("cents", cents, "double[]")
      val idRef = ctx.addReferenceObj("cells", cells, "int[]")
      val (i, j) = (ctx.freshName("i"), ctx.freshName("j"))
      val (best, bc, dot, v) = (ctx.freshName("best"), ctx.freshName("bc"),
        ctx.freshName("dot"), ctx.freshName("v"))
      val get = if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |if ($a.numElements() < $dim) { ${ev.isNull} = true; } else {
         |  double $best = Double.NEGATIVE_INFINITY; int $bc = Integer.MIN_VALUE;
         |  for (int $i = 0; $i < $k && !${ev.isNull}; $i++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |      double $v = $get; $dot += $v * $cRef[$i * $dim + $j];
         |    }
         |    int ${i}_cmp = ${SqlDoubleOrder.javaSrc(dot, best)};
         |    if (${i}_cmp > 0 || (${i}_cmp == 0 && $idRef[$i] > $bc)) {
         |      $best = $dot; $bc = $idRef[$i];
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $bc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
