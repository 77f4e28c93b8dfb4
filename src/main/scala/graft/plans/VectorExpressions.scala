package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The declarative form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates an intermediate array and runs interpreted lambda calls
  * per element — fine for one vector, ruinous for millions of
  * candidate pairs. This expression compiles to a tight primitive
  * loop via `doGenCode` (whole-stage codegen), with an interpreted
  * `nullSafeEval` fallback.
  *
  * Semantics match the declarative form bit-for-bit: each element is
  * promoted to double *before* the multiply and the sum is a strict
  * ascending-index left fold from +0.0 — the same double every time,
  * identical to DuckDB's `list_cosine_similarity` internals (verified
  * bitwise on the test corpus). A null element or a length mismatch
  * makes the result null (exactly what `zip_with`'s null padding and
  * null-propagating multiply produce in the declarative twin).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Always nullable: a null element (or length mismatch) yields null
    * regardless of child nullability. Also keeps `nullSafeCodeGen`
    * from emitting `ev.isNull` as the literal `false` (which the
    * null-element branch below would then try to assign). */
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = lt match {
        case FloatType => xs.getFloat(i).toDouble
        case _ => xs.getDouble(i)
      }
      val y = rt match {
        case FloatType => ys.getFloat(i).toDouble
        case _ => ys.getDouble(i)
      }
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, t: NumericType): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${get(a, i, lt)} * ${get(b, i, rt)};
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-level fused dot product (codegen). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
