package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity — the order-tolerant, prefix-weighted name
  * matcher entity resolution actually runs next to edit distance:
  * [[DamerauLevenshtein]] prices whole edits (right for identifiers),
  * Jaro–Winkler scores partial agreement of short names where
  * character ORDER matters less than shared content and a shared
  * PREFIX matters more (the "Martha"/"Marhta" class). Spark ships
  * `levenshtein` only; this is the missing verify kernel for
  * blocked fuzzy matching over name columns.
  *
  * Semantics pinned against DuckDB's `jaro_winkler_similarity` (the
  * q322 oracle engine; HashingSpec hard-pins a value table probed from
  * it):
  *  - Jaro: match window ⌊max(|a|,|b|)/2⌋−1 (≥0), greedy left-to-right
  *    matching, transpositions = half the matched positions whose
  *    characters disagree in order; (m/|a| + m/|b| + (m−t)/m)/3.
  *  - Winkler boost only when jaro > 0.7 (the rapidfuzz convention
  *    DuckDB inherits, NOT the unconditional textbook form):
  *    jw = jaro + min(prefix, 4)·0.1·(1−jaro).
  *  - Either side empty ⇒ 0.0 (including BOTH empty — DuckDB returns
  *    0.0 there, probed explicitly).
  *
  * O(|a|·|b|) per pair worst case (window-bounded in practice) — same
  * contract as the DL kernel: the CALLER bounds pair volume by
  * blocking; the kernel does not early-exit. Codegen emits one static
  * call so the surrounding verify filter stays inside whole-stage
  * codegen. Operates on Unicode codepoints (fixture is ASCII).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static kernel (called from generated code). */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb - 1, i + win)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order; t counts the
    // disagreeing positions, the formula halves it
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // t halves by INTEGER division (rapidfuzz, hence DuckDB): the
    // matched sequences are permutations of each other, but the
    // disagreement count can still be ODD (a 3-cycle like 150/015
    // disagrees at all three positions), and rapidfuzz floors the
    // half. `t / 2.0` diverged from the oracle exactly there —
    // surfaced by q322 at sf0.001 (r17 inherited-bug fix; the pinned
    // HashingSpec table now carries an odd-disagreement probe).
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val lmax = math.min(4, math.min(la, lb))
      while (l < lmax && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
