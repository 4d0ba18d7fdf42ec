package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein distance — edit distance
  * with adjacent transpositions counted as ONE edit, where a
  * transposed pair may still participate in later edits (so
  * "CA"→"ABC" is 2, not the OSA variant's 3; pinned against DuckDB's
  * `damerau_levenshtein` in HashingSpec, which is the oracle engine
  * for q189). Spark ships `levenshtein` but nothing
  * transposition-aware, and digit swaps are THE canonical human typo
  * in identifier columns — an entity-resolution verify that uses
  * plain levenshtein prices a swap at 2 and misses it at threshold 1.
  *
  * Algorithm: the classic "distance with adjacent transpositions" DP
  * (a (la+2)×(lb+2) matrix + per-codepoint last-seen-row map);
  * O(la·lb) time per pair — same contract as Spark's own levenshtein:
  * the CALLER bounds pair volume by equality blocking (q120/q189
  * shape), the kernel does not early-exit.
  *
  * Codegen emits one static call to the JVM kernel (the standard
  * native-expression pattern), so the surrounding filter/projection
  * stays inside whole-stage codegen — no CodegenFallback row boxing
  * in the verify hot path.
  *
  * Operates on Unicode codepoints; matches DuckDB on any BMP+ text
  * without combining sequences (the fixture is ASCII).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires (string, string), got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** Static kernel (called from generated code). */
  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2)×(lb+2), offset by 2: d(i+1)(j+1) corresponds to
    // prefixes a[0,i) / b[0,j)
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new java.util.HashMap[Int, Int]() // codepoint → last row seen
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}
