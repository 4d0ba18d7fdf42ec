package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over an array of mod-p shingle hashes —
  * bit-identical to the higher-order formulation it replaces
  * (Dedup.minhashSignatureHof: for permutation i,
  * `array_min(transform(hs, h -> (h*a_i + b_i) % p))` with
  * Hashing.coefA/coefB) but ONE pass over the hashes updating
  * `numHashes` running minima, instead of numHashes interpreted
  * transform+array_min scans (O(numHashes × shingles) lambda
  * invocations — the dominant cost of every MinHash consumer: the
  * signature, LSH-candidate, Jaccard-verify, training-pipeline, and
  * connected-components queries).
  *
  * Inputs are < p < 2^31 and a_i < 2^31, so products stay < 2^62 — the
  * same no-overflow contract the column formulation documents. A null
  * element nulls that permutation's min in the HOF (`transform` maps
  * null→null and `array_min` ... skips nulls), so to stay exactly
  * equivalent we replicate array_min's null-skipping: null elements
  * are ignored; an all-null/empty input yields an all-null signature.
  * Real codegen (r17): the generated code calls the same evaluator
  * through an instance reference (the BloomMightContain pattern), so
  * the enclosing projection stays whole-stage compiled. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got $other")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  private val P = Hashing.SmallPrime
  private val as: Array[Long] = Array.tabulate(numHashes)(Hashing.coefA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(Hashing.coefB)

  protected override def nullSafeEval(input: Any): Any =
    signature(input.asInstanceOf[ArrayData])

  /** Public because the generated code calls it. */
  def signature(ad: ArrayData): ArrayData = {
    val n = ad.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!ad.isNullAt(j)) {
        any = true
        val h = ad.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = (h * as(i) + bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSignature", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.signature($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
