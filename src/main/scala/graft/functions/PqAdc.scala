package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused PQ asymmetric-distance accumulator: given a query's m
  * per-subspace LUT columns (array<double>, lut_j[c] = dot(q_j, ĉ_{j,c}))
  * and a corpus row's m code columns (0-based int), evaluates
  * Σ_j lut_j[code_j] as ONE codegen'd expression — the `DotProd`
  * treatment for the ADC scan (r8 verdict item 4).
  *
  * Replaces the m-term `element_at(lut_j, code_j + 1)` chain in
  * `Similarity.pqAdcTopK`/`ivfPqTopK`, whose per-term generated calls
  * (each with its own null/branch scaffolding) made the ADC scan ~1.7×
  * the wall of a codegen'd brute-force 64-float dot at in-memory scale —
  * losing exactly where the operator is supposed to win. Here the scan
  * body is m array loads + m adds inside whole-stage codegen.
  *
  * Bit-identity contract (asserted in HashingSpec): terms accumulate in
  * subspace order j = 0..m-1, identical to the left
  * `reduce(_ + _)` of the element_at chain, so every q293/q295 ADC sum
  * is unchanged. Null contract: a null lut, null code, or null lut slot
  * nulls the whole sum (as the chain's does); an OUT-OF-RANGE code also
  * nulls it (try_element_at semantics — ANSI element_at would throw;
  * codes are in-range by construction via cellOf, so the defensive null
  * is strictly safer than the chain it replaces).
  */
case class PqAdc(luts: Seq[Expression], codes: Seq[Expression])
    extends Expression {
  require(luts.nonEmpty && luts.size == codes.size,
    s"pq_adc needs matching lut/code arity, got ${luts.size}/${codes.size}")
  // doGenCode unrolls all m lut/code steps inline (straight-line adds
  // inside the caller's whole-stage-codegen method). A large m would
  // blow the JVM's 64KB method-bytecode limit AT RUNTIME, inside
  // generated code — bound it here where the message can say why.
  // PQ configurations with m > 16 are unusual (m=4..8 typical); lift
  // this only together with a ctx.splitExpressions fallback.
  require(luts.size <= 16,
    s"pq_adc unrolls m=${luts.size} subspace steps inline in codegen; " +
      "m > 16 risks the JVM 64KB generated-method limit")

  override def children: Seq[Expression] = luts ++ codes
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    val badLut = luts.exists {
      _.dataType match {
        case ArrayType(DoubleType, _) => false
        case _ => true
      }
    }
    val badCode = codes.exists(_.dataType != IntegerType)
    if (badLut || badCode) TypeCheckResult.TypeCheckFailure(
      "pq_adc requires m array<double> luts then m int codes, got " +
        children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val m = luts.size

  override def eval(input: InternalRow): Any = {
    var acc = 0.0
    var j = 0
    while (j < m) {
      val lv = luts(j).eval(input)
      val cv = codes(j).eval(input)
      if (lv == null || cv == null) return null
      val a = lv.asInstanceOf[ArrayData]
      val idx = cv.asInstanceOf[Int]
      if (idx < 0 || idx >= a.numElements() || a.isNullAt(idx)) return null
      acc += a.getDouble(idx)
      j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutGen = luts.map(_.genCode(ctx))
    val codeGen = codes.map(_.genCode(ctx))
    // m is small (4 here); unrolled straight-line adds, each guarded by
    // the short-circuit null flag so a null term skips the rest.
    val steps = (0 until m).map { j =>
      val lg = lutGen(j); val cg = codeGen(j)
      val idx = ctx.freshName("adcIdx")
      s"""
       |if (!${ev.isNull}) {
       |  ${lg.code}
       |  ${cg.code}
       |  if (${lg.isNull} || ${cg.isNull}) {
       |    ${ev.isNull} = true;
       |  } else {
       |    final int $idx = ${cg.value};
       |    if ($idx < 0 || $idx >= ${lg.value}.numElements() ||
       |        ${lg.value}.isNullAt($idx)) {
       |      ${ev.isNull} = true;
       |    } else {
       |      ${ev.value} += ${lg.value}.getDouble($idx);
       |    }
       |  }
       |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        double ${ev.value} = 0.0;
        $steps
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdc =
    copy(luts = newChildren.take(m), codes = newChildren.drop(m))
}
