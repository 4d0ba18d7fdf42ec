package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Robust-winnowing fingerprint selection (the MOSS scheme) over a
  * doc's gram-hash array in ONE linear pass: for every window start
  * p ∈ [1, max(n−W+1, 1)] take the minimum of c_i = h_i·shift +
  * (shift−1−i) over the grams i ∈ [p, min(p+W−1, n)] the window covers
  * (the rightmost-minimum tie rule riding a single integer, exactly as
  * q220 documents), emit wmin DIV shift, and collapse ADJACENT equal
  * minima (the same gram instance selected by overlapping windows —
  * the winnowing density guarantee). The emitted array may still hold
  * non-adjacent repeats of a hash; callers distinct() downstream,
  * exactly like the formulations this replaces.
  *
  * Work-proportional by construction: O(n·W) comparisons and ~0.4·n
  * output values for n grams. The r16 explode-to-window-starts
  * aggregate it replaces multiplied every gram row by W and paid a
  * hash aggregate over the blow-up (~17× the executor task-time of
  * the r15 window, per the round-16 verdict); the r15 sliding-min
  * WindowExec paid a per-doc-group frame setup under Spark's codegen
  * KeyLock. Both costs disappear into this kernel.
  *
  * CONTRACT (operator-owned, like SortedIntersectCount): elements are
  * non-null gram hashes with h ≥ 0 and gram positions < shift, as
  * produced by ShingleHashes(mod = true). NULL input → NULL output;
  * an EMPTY array yields an empty array (the explode of either emits
  * no rows, matching the old posexplode of an empty hash array). */
case class WinnowFingerprints(child: Expression, windowSize: Int, shift: Long)
    extends UnaryExpression {

  require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
  require(shift >= 2, s"shift must be >= 2, got $shift")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  /** Public because the generated code calls it through a reference to
    * this expression instance (the BloomMightContain pattern). */
  def winnowArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n == 0) return WinnowFingerprints.Empty
    val w = windowSize
    val nw = math.max(n - w + 1, 1)
    val out = new Array[Long](nw)
    var m = 0
    var prev = 0L
    var p = 1
    while (p <= nw) {
      // naive W-scan per window: W is small (4 in the fingerprint
      // family), so this beats deque bookkeeping and stays branch-light
      var mn = Long.MaxValue
      val hi = math.min(p + w - 1, n)
      var i = p
      while (i <= hi) {
        val c = input.getLong(i - 1) * shift + (shift - 1L - i)
        if (c < mn) mn = c
        i += 1
      }
      if (m == 0 || mn != prev) { out(m) = mn / shift; m += 1; prev = mn }
      p += 1
    }
    new GenericArrayData(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  protected override def nullSafeEval(input: Any): Any =
    winnowArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowFingerprints", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.winnowArray($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  private val Empty = new GenericArrayData(Array.emptyLongArray)
}
