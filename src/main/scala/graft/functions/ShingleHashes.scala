package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluator for the tokenize → shingle → portable-hash pipeline
  * that feeds every text sketch (minhash signatures, simhash votes,
  * fingerprints). Semantically identical to
  * `transform(Dedup.shingles(text, n), s => Hashing.md5Mod(s))`
  * (asserted in HashingSpec) — same tokenizer (trim → lower → split
  * `\s+`, exactly Spark's `lower`/`trim`/`split` via the UTF8String
  * operations those functions call), same space-joined shingles, same
  * Md5Long60 digest — but evaluated in one flat pass with no
  * intermediate Catalyst arrays or per-element lambda interpretation.
  * `mod = true` applies the % SmallPrime reduction (minhash/fingerprint
  * family); `mod = false` yields raw 60-bit hashes (simhash family).
  * shingleSize = 1 degenerates to per-token hashes.
  *
  * Real codegen (r17): the CodegenFallback this replaces dropped the
  * WHOLE enclosing projection out of whole-stage codegen and re-entered
  * interpreted eval (boxing the operand) once per document row across
  * the text-sketch family (q220/q309/q312, the minhash/simhash
  * pipelines). The generated code calls straight into the same
  * per-value evaluator through a reference to this instance (the
  * BloomMightContain pattern), keeping the surrounding operators
  * compiled. */
case class ShingleHashes(child: Expression, shingleSize: Int, mod: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    evalShingles(input.asInstanceOf[UTF8String])

  /** Public because the generated code calls it through a reference to
    * this expression instance. */
  def evalShingles(input: UTF8String): ArrayData = {
    // lower-then-trim exactly as tokens() = split(trim(lower(text)))
    // (UTF8String ops are what Spark's lower()/trim() call)
    val s = input.toLowerCase.trim().toString
    val toks = s.split("\\s+", -1) // Spark split keeps trailing empties
    val n = shingleSize
    val out =
      if (toks.length >= n) {
        val arr = new Array[Long](toks.length - n + 1)
        var i = 0
        while (i < arr.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var k = 1
          while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
          arr(i) = hashOne(sb.toString)
          i += 1
        }
        arr
      } else Array(hashOne(toks.mkString(" ")))
    new GenericArrayData(out)
  }

  private def hashOne(shingle: String): Long = {
    val h = Md5Long60.hash(UTF8String.fromString(shingle))
    if (mod) h % Hashing.SmallPrime else h
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this,
      classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalShingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
