package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-row dot products of a vector column against an embedded
  * matrix (the IVF coarse quantizer's normalized centroids) — bit-
  * identical to the higher-order formulation
  * (Similarity.scoreArrCentHof: per centroid,
  * `aggregate(zip_with(vec, ĉ, _*_), 0.0, _+_)` — a left fold) but one
  * flat loop, the same treatment SignLshBuckets gives its hyperplanes:
  * the matrix rides the expression as DATA, so plan size is O(1) in
  * nlist×dim and per-row cost is nlist×dim multiply-adds instead of
  * interpreted lambda dispatch.
  *
  * A vector whose length differs from a centroid's yields a NULL score
  * for that centroid (zip_with pads the shorter side with nulls, which
  * nulls the HOF's fold); a NULL element in the vector nulls EVERY
  * centroid's score (the null product nulls each per-centroid fold). */
case class DotScores(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dot_scores requires array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "dot_scores"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val matrix: Array[Array[Double]] = cents.map(_.toArray).toArray

  protected override def nullSafeEval(input: Any): Any =
    scoresOf(input.asInstanceOf[ArrayData])

  /** Public because the generated code calls it (r17 real codegen,
    * the BloomMightContain pattern). */
  def scoresOf(ad: ArrayData): ArrayData = {
    val n = ad.numElements()
    val v = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (ad.isNullAt(j))
        return new GenericArrayData(new Array[Any](matrix.length))
      v(j) = if (isFloat) ad.getFloat(j).toDouble else ad.getDouble(j)
      j += 1
    }
    val out = new Array[Any](matrix.length)
    var i = 0
    while (i < matrix.length) {
      val c = matrix(i)
      if (c.length != n) out(i) = null
      else {
        var acc = 0.0
        var k = 0
        while (k < n) { acc += v(k) * c(k); k += 1 }
        out(i) = acc
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dotScores", this,
      classOf[DotScores].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.scoresOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DotScores =
    copy(child = newChild)
}
