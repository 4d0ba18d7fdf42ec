package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection size of two SORTED-ascending distinct array<long>
  * columns via a single merge walk — the verify kernel of the exact
  * set-similarity join (Dedup.similarityJoinPrefix). `array_intersect`
  * builds a per-row hash set of boxed elements; over millions of
  * candidate pairs the merge walk on primitive longs is the difference
  * between the verify step dominating the query and disappearing into
  * it (measured 43s → ~3s on the q182 shape at sf0.1).
  *
  * The sortedness/distinctness CONTRACT is the caller's (sort_array
  * over array_distinct'd sets); on unsorted input the result is merely
  * a lower bound — which is why the operator, not end users, owns this
  * expression. NULL input → NULL; null ELEMENTS cannot occur in the
  * md5-hash arrays the operator builds, but a defensive null element
  * also yields NULL rather than a silent skip.
  * Real codegen (r16): the old CodegenFallback boxed both operands and
  * re-entered interpreted eval once per CANDIDATE PAIR — millions of
  * rows in q182/q185 and one per oriented edge in q78's edge-iterator
  * triangle count; the generated merge walk below reads the unsafe
  * array words directly with zero allocations. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires array<bigint>, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  // null ELEMENTS yield NULL (see CosineSim's nullability rationale)
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val na = va.numElements()
    val nb = vb.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (va.isNullAt(i) || vb.isNullAt(j)) return null
      val x = va.getLong(i)
      val y = vb.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val va = ctx.freshName("va")
    val vb = ctx.freshName("vb")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull} || ${rightGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $va = ${leftGen.value};
          org.apache.spark.sql.catalyst.util.ArrayData $vb = ${rightGen.value};
          int $na = $va.numElements();
          int $nb = $vb.numElements();
          int $i = 0;
          int $j = 0;
          while ($i < $na && $j < $nb) {
            if ($va.isNullAt($i) || $vb.isNullAt($j)) {
              ${ev.isNull} = true;
              break;
            }
            long $x = $va.getLong($i);
            long $y = $vb.getLong($j);
            if ($x == $y) { ${ev.value}++; $i++; $j++; }
            else if ($x < $y) { $i++; } else { $j++; }
          }
        }"""
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
