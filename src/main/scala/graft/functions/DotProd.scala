package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native left-fold dot product over two vector columns — exactly
  * [[CosineSim]]'s `dot` accumulator with the two norm accumulators
  * removed. Exists for the ALL-PAIRS shapes (q200 label-noise kNN,
  * cluster-representative scans): there the norms depend on one SIDE
  * each, so hoisting them to per-row columns and computing only the
  * dot per PAIR cuts the inner loop from 3 multiply-adds to 1 —
  * `DotProd(a,b) / (norm_a · norm_b)` is bit-identical to
  * `CosineSim(a,b)` because every fold involved is unchanged
  * (asserted in HashingSpec).
  *
  * Same null contract as CosineSim: mismatched lengths or a null
  * element yield NULL, hence `nullable = true` unconditionally.
  * Real codegen (r17): the CosineSim rationale, and this node sits in
  * the hottest all-pairs inner loops in the registry. */
case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_prod requires array<float|double>, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_prod"
  override def nullable: Boolean = true

  private lazy val leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Boxed so a mismatched-length / null-element NULL crosses the
    * codegen boundary; public because the generated code calls it. */
  def compute(va: ArrayData, vb: ArrayData): java.lang.Double = {
    val n = va.numElements()
    if (vb.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      val x = if (leftFloat) va.getFloat(i).toDouble else va.getDouble(i)
      val y = if (rightFloat) vb.getFloat(i).toDouble else vb.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dotProd", this,
      classOf[DotProd].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Boxed = $self.compute($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}
