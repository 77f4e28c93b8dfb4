package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** The ADC distance kernel, fused: `Σ_m (|cw_{m,c_m}|² − 2·q_m·cw_{m,c_m})`
  * for one (query vector, code array) pair — the data-dependent half
  * of the asymmetric distance `|q|² + Σ(...)` (the `|q|²` term rides
  * outside so this sum stays bit-identical to the declarative
  * higher-order-function chain it replaces).
  *
  * Why an expression and not the HOF algebra: Spark evaluates
  * `aggregate`/`transform` lambdas INTERPRETED, outside whole-stage
  * codegen — measured at 1.9× the cost of the full-vector cosine
  * probe the coded store exists to beat (bench_store_sf1_pq_x40
  * .json). This kernel carries the codebook and its squared norms as
  * two codegen reference objects (the [[PlaneFamilyExpression]]
  * discipline: plan size constant in numSub × numCodewords × dsub,
  * no literal dumps in explain) and generates the flat double loop —
  * the same multiply count as one full-dim dot product, inside
  * codegen.
  *
  * Null semantics mirror the HOF form exactly (spec-asserted raw-bit
  * equality): a null query vector or code array nulls the sum; an
  * out-of-range code (element_at past the codebook), a query shorter
  * than the codebook's dimension, a null query element, or a code
  * array whose LENGTH differs from the codebook count null it too —
  * a truncated code must fail loudly, not sum fewer subspaces and
  * rank spuriously near (a partial Σ is a smaller distance).
  * Accumulation order is the HOF's strict ascending left fold
  * from +0.0 at both levels, with float query elements promoted to
  * double before the multiply.
  */
case class AdcSum(left: Expression, right: Expression,
                  codebooks: Seq[Seq[Seq[Double]]],
                  norm2: Seq[Seq[Double]])
    extends BinaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    "empty codebook")

  @transient private lazy val cw: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    norm2.map(_.toArray).toArray
  private def dsub: Int = codebooks.head.head.length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_sum"
  private def shapeTag: String =
    s"${codebooks.size}x${codebooks.head.size}x$dsub"
  override def toString: String =
    s"adc_sum($left, $right, book=$shapeTag)"
  override def sql: String =
    s"adc_sum(${left.sql}, ${right.sql}, book=$shapeTag)"

  private def qElemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_sum needs (array<float|double>, array<int>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val q = left.eval(input)
    val codes = right.eval(input)
    if (q == null || codes == null) return null
    val qa = q.asInstanceOf[ArrayData]
    val ca = codes.asInstanceOf[ArrayData]
    if (ca.numElements() != cw.length) return null
    val isFloat = qElemIsFloat
    val d = dsub
    var acc = 0.0
    var m = 0
    while (m < ca.numElements()) {
      if (ca.isNullAt(m)) return null
      val c = ca.getInt(m)
      if (c < 0 || c >= cw(m).length) return null
      val w = cw(m)(c)
      var dot = 0.0
      var p = 0
      while (p < d) {
        val idx = m * d + p
        if (idx >= qa.numElements() || qa.isNullAt(idx)) return null
        val x = if (isFloat) qa.getFloat(idx).toDouble else qa.getDouble(idx)
        dot += x * w(p)
        p += 1
      }
      acc += cn2(m)(c) - 2.0 * dot
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val qGen = left.genCode(ctx)
    val cGen = right.genCode(ctx)
    val cwRef = ctx.addReferenceObj("cw", cw, "double[][][]")
    val cn2Ref = ctx.addReferenceObj("cn2", cn2, "double[][]")
    val get =
      if (qElemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val acc = ctx.freshName("acc")
    val m = ctx.freshName("m")
    val c = ctx.freshName("c")
    val w = ctx.freshName("w")
    val dot = ctx.freshName("dot")
    val p = ctx.freshName("p")
    val idx = ctx.freshName("idx")
    val qa = ctx.freshName("qa")
    val ca = ctx.freshName("ca")
    val code =
      code"""
         |${qGen.code}
         |${cGen.code}
         |boolean ${ev.isNull} = ${qGen.isNull} || ${cGen.isNull};
         |double ${ev.value} = 0.0;
         |if (!${ev.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $qa = ${qGen.value};
         |  org.apache.spark.sql.catalyst.util.ArrayData $ca = ${cGen.value};
         |  if ($ca.numElements() != $cwRef.length) ${ev.isNull} = true;
         |  double $acc = 0.0;
         |  for (int $m = 0; $m < $ca.numElements() && !${ev.isNull}; $m++) {
         |    if ($ca.isNullAt($m)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    int $c = $ca.getInt($m);
         |    if ($c < 0 || $c >= $cwRef[$m].length) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double[] $w = $cwRef[$m][$c];
         |    double $dot = 0.0;
         |    for (int $p = 0; $p < ${dsub}; $p++) {
         |      int $idx = $m * ${dsub} + $p;
         |      if ($idx >= $qa.numElements() || $qa.isNullAt($idx)) {
         |        ${ev.isNull} = true; break;
         |      }
         |      $dot += ${get(qa, idx)} * $w[$p];
         |    }
         |    if (!${ev.isNull}) $acc += $cn2Ref[$m][$c] - 2.0 * $dot;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** The fused ADC kernel as a Column: `adcSum(query, code)` under a
    * bound codebook. */
  def adcSum(query: Column, code: Column,
             codebooks: Seq[Seq[Seq[Double]]],
             norm2: Seq[Seq[Double]]): Column =
    ColumnBridge.column(AdcSum(ColumnBridge.expression(query),
      ColumnBridge.expression(code), codebooks, norm2))
}
