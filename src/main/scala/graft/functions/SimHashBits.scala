package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SimHash over an array of 60-bit token hashes — bit-identical
  * to the higher-order formulation it replaces (Dedup.simhashHof: for
  * each bit b, `size(filter(hs, h -> (h >> b) % 2 == 1)) * 2 > n`
  * contributes 2^b), but ONE pass over the hashes with `bits` counters
  * instead of `bits` interpreted filter+size scans (O(bits × tokens)
  * lambda invocations — the dominant cost of the sketch pipeline).
  *
  * Null elements replicate the HOF's semantics exactly: they count
  * toward n (size of the array) but never toward a bit's ones (filter
  * drops null-predicate elements). Real codegen (r17): the generated
  * code calls the same evaluator through an instance reference (the
  * BloomMightContain pattern), so the enclosing projection stays
  * whole-stage compiled. */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires array<bigint>, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  protected override def nullSafeEval(input: Any): Any =
    sketchOf(input.asInstanceOf[ArrayData])

  /** Public because the generated code calls it. */
  def sketchOf(ad: ArrayData): Long = {
    val n = ad.numElements()
    val ones = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val h = ad.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) ones(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < bits) {
      if (2L * ones(b) > n) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHashBits", this,
      classOf[SimHashBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.sketchOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}
