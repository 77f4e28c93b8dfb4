package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** The PQ ENCODE kernel, fused: per subspace m, the dense id of the
  * codeword maximizing the margin `2·(v_m · c) − |c|²` (≡ min L2,
  * |v_m|² constant within the subspace), ties to the larger id — one
  * `array<int>` of `numSub` codes per vector.
  *
  * Why an expression and not the declarative chain: the argmin ran
  * as `transform`/`array_max` lambdas over a [[PlaneDots]] output —
  * INTERPRETED, outside whole-stage codegen (the measured AdcSum
  * lesson: 1.9× on the probe path), and the per-subspace `|c|²`
  * arrays rode the plan as LITERALS (256 doubles × numSub at a
  * serving-budget codebook — the plan-growth the plane-matrix
  * binding exists to prevent). This kernel carries codebook and
  * norms as two codegen reference objects and generates the flat
  * argmax loop. Encode is the dominant cost of every
  * [[graft.io.PqIndexStore]] build, so the build pays it once at
  * codegen speed.
  *
  * Parity contract (spec-pinned, raw codes, organic + adversarial):
  * mirrors the declarative chain BIT FOR BIT, including the edges —
  * a null vector, a vector too short for a subspace, or a null
  * element yields null dots, and the struct-max over (null margin,
  * id) ties down to `numCodewords − 1` exactly as `array_max` does;
  * double comparison replicates SQL ordering (NaN greatest,
  * −0.0 == 0.0), not `java.lang.Double.compare`. */
case class PqCodes(child: Expression,
                   codebooks: Seq[Seq[Seq[Double]]],
                   norm2: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebook")

  @transient private lazy val cw: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    norm2.map(_.toArray).toArray
  private def dsub: Int = codebooks.head.head.length

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_codes"
  private def shapeTag: String =
    s"${codebooks.size}x${codebooks.head.size}x$dsub"
  override def toString: String = s"pq_codes($child, book=$shapeTag)"
  override def sql: String = s"pq_codes(${child.sql}, book=$shapeTag)"

  private def vecElemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes needs array<float|double>, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val va = if (v == null) null else v.asInstanceOf[ArrayData]
    val isFloat = vecElemIsFloat
    val d = dsub
    val out = new Array[Int](cw.length)
    var m = 0
    while (m < cw.length) {
      val base = m * d
      var best = -1
      var bestS = 0.0
      var bestNull = true
      var c = 0
      while (c < cw(m).length) {
        // dot is null when the vector is null, the slice is short,
        // or any slice element is null — mirroring slice+PlaneDots
        var sNull = va == null || va.numElements() < base + d
        var s = 0.0
        if (!sNull) {
          val w = cw(m)(c)
          var dot = 0.0
          var p = 0
          while (p < d && !sNull) {
            if (va.isNullAt(base + p)) sNull = true
            else {
              val x = if (isFloat) va.getFloat(base + p).toDouble
                      else va.getDouble(base + p)
              dot += x * w(p)
            }
            p += 1
          }
          if (!sNull) s = dot * 2 - cn2(m)(c)
        }
        // SQL struct-max: non-null margin beats null; greater margin
        // wins (NaN greatest, -0.0 == 0.0); ties to the larger id
        val take =
          if (sNull) bestNull // equal (both null) -> larger c wins
          else bestNull || sqlGt(s, bestS) || s == bestS ||
            (s != s && bestS != bestS)
        if (take) { best = c; bestS = s; bestNull = sNull }
        c += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }

  private def sqlGt(a: Double, b: Double): Boolean =
    if (a > b) true
    else if (a < b || a == b) false
    else java.lang.Double.compare(a, b) > 0 // NaN handling

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val childGen = child.genCode(ctx)
    val cwRef = ctx.addReferenceObj("cw", cw, "double[][][]")
    val cn2Ref = ctx.addReferenceObj("cn2", cn2, "double[][]")
    val get =
      if (vecElemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val va = ctx.freshName("va")
    val out = ctx.freshName("out")
    val m = ctx.freshName("m")
    val c = ctx.freshName("c")
    val base = ctx.freshName("base")
    val best = ctx.freshName("best")
    val bestS = ctx.freshName("bestS")
    val bestNull = ctx.freshName("bestNull")
    val sNull = ctx.freshName("sNull")
    val s = ctx.freshName("s")
    val dot = ctx.freshName("dot")
    val w = ctx.freshName("w")
    val p = ctx.freshName("p")
    val take = ctx.freshName("take")
    val idx = ctx.freshName("idx")
    val code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData $va =
         |  ${childGen.isNull} ? null : ${childGen.value};
         |int[] $out = new int[${cw.length}];
         |for (int $m = 0; $m < ${cw.length}; $m++) {
         |  int $base = $m * ${dsub};
         |  int $best = -1;
         |  double $bestS = 0.0;
         |  boolean $bestNull = true;
         |  for (int $c = 0; $c < $cwRef[$m].length; $c++) {
         |    boolean $sNull = $va == null ||
         |      $va.numElements() < $base + ${dsub};
         |    double $s = 0.0;
         |    if (!$sNull) {
         |      double[] $w = $cwRef[$m][$c];
         |      double $dot = 0.0;
         |      for (int $p = 0; $p < ${dsub} && !$sNull; $p++) {
         |        int $idx = $base + $p;
         |        if ($va.isNullAt($idx)) { $sNull = true; }
         |        else { $dot += ${get(va, idx)} * $w[$p]; }
         |      }
         |      if (!$sNull) $s = $dot * 2 - $cn2Ref[$m][$c];
         |    }
         |    boolean $take;
         |    if ($sNull) { $take = $bestNull; }
         |    else {
         |      $take = $bestNull || ($s > $bestS) || ($s == $bestS) ||
         |        (Double.isNaN($s) && !Double.isNaN($bestS)) ||
         |        (Double.isNaN($s) && Double.isNaN($bestS));
         |    }
         |    if ($take) { $best = $c; $bestS = $s; $bestNull = $sNull; }
         |  }
         |  $out[$m] = $best;
         |}
         |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
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

  /** The fused PQ encode kernel as a Column: `pqCodes(vec)` under a
    * bound codebook. */
  def pqCodes(vec: Column, codebooks: Seq[Seq[Seq[Double]]],
              norm2: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec),
      codebooks, norm2))
}
