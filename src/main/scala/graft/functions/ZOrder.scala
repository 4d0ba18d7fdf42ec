package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaved Z-order (Morton) value of two non-negative longs,
  * `bitsPerDim` low bits each: bit i of x lands at position 2i, bit i
  * of y at 2i+1. Locality in BOTH dimensions maps to locality on the
  * one-dimensional Z-curve, which is what lets a single range partition
  * + sort cluster files so parquet min/max prune on EITHER column —
  * the multi-dimensional layout trick behind Delta/Iceberg Z-ordering,
  * here as a plain deterministic expression any engine can recompute
  * (the oracle rebuilds it from shifts and masks). */
case class ZOrderValue(left: Expression, right: Expression,
    bitsPerDim: Int = 16)
    extends BinaryExpression {

  require(bitsPerDim > 0 && bitsPerDim <= 31,
    s"bitsPerDim must be in [1,31], got $bitsPerDim")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder requires (long, long), got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long],
      bitsPerDim)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderValue$$.MODULE$$.interleave($x, $y, $bitsPerDim)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderValue =
    copy(left = newLeft, right = newRight)
}

object ZOrderValue {
  /** Plain loop interleave — called from both interpreted eval and
    * generated code; the executable spec the oracle SQL mirrors. */
  def interleave(x: Long, y: Long, bitsPerDim: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bitsPerDim) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}
