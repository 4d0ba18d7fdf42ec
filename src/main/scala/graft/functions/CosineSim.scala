package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native evaluator for cosine similarity over two vector columns —
  * bit-identical to the higher-order-function formulation it replaces
  * (graft.operators.Similarity.cosineHof: left-fold dot product and
  * left-fold norms in double, then dot / (normA * normB); asserted in
  * HashingSpec) but computed in ONE flat loop per row instead of three
  * interpreted aggregate/zip_with lambda chains. The three accumulators
  * are independent left folds, so fusing them into one pass changes no
  * bit of any of them. Real codegen (r17): the generated code calls the
  * same evaluator through an instance reference (the BloomMightContain
  * pattern), so the enclosing projection stays whole-stage compiled
  * instead of dropping to interpreted per-row eval around the node.
  *
  * Mismatched lengths yield NULL (the HOF's zip_with pads with nulls,
  * which also nulls the fold), and so does a NULL element on either
  * side (a null product nulls the left fold). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // MUST be true even for non-nullable inputs: mismatched lengths and
  // null ELEMENTS yield NULL, which the default (children-derived)
  // nullability can't see. An expression that under-declares
  // nullability corrupts results silently — InterpretedMutableProjection
  // (ConvertToLocalRelation) trusts `nullable` and writes an unchecked
  // null into a primitive slot as 0.0.
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
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      val x = if (leftFloat) va.getFloat(i).toDouble else va.getDouble(i)
      val y = if (rightFloat) vb.getFloat(i).toDouble else vb.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cosineSim", this,
      classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Boxed = $self.compute($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
