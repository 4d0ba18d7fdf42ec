package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native evaluator for multi-table sign-LSH buckets (see
  * graft.operators.Similarity.lshBuckets for the algorithm and the
  * hyperplane derivation). Bit-identical to the higher-order-function
  * formulation — same md5-derived planes, same left-to-right double
  * fold per plane, same Σ bit_i·2^i bucket encoding (asserted in
  * HashingSpec) — but evaluated as one flat loop instead of
  * tables × bits × dim interpreted lambda nodes, which is worth
  * seconds per million rows. Real codegen (r17): the generated code
  * calls the same evaluator through an instance reference (the
  * BloomMightContain pattern), so the enclosing projection stays
  * whole-stage compiled. */
case class SignLshBuckets(child: Expression, dim: Int, bits: Int,
    tables: Int, planeSeed: String = "plane")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets requires array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  // lazy: child.dataType is only known after analysis resolves it
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** planes(globalPlane)(dim), derived exactly like
    * Similarity.planeComponent. */
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(tables * bits, dim) { (gi, j) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${planeSeed}_${gi}_$j".getBytes("UTF-8"))
        .take(7).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16).toDouble / Math.pow(2.0, 56)) - 0.5
    }

  protected override def nullSafeEval(input: Any): Any =
    bucketsOf(input.asInstanceOf[ArrayData])

  /** Public because the generated code calls it. */
  def bucketsOf(ad: ArrayData): ArrayData = {
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      v(j) = if (isFloat) ad.getFloat(j).toDouble else ad.getDouble(j)
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var i = bits - 1
      while (i >= 0) { // high→low: acc*2 + bit ≡ Σ bit_i·2^i
        val p = planes(t * bits + i)
        var d = 0.0
        var k = 0
        while (k < dim) { d += v(k) * p(k); k += 1 } // left fold, like `dot`
        acc = acc * 2 + (if (d > 0) 1L else 0L)
        i -= 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signLshBuckets", this,
      classOf[SignLshBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.bucketsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}
