package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mutable aggregation state for [[OuterProductSum]]: the d_y×d_x
  * matrix of exact decimal partial sums, dims latched from the first
  * row seen. One buffer per partition is the whole point — the
  * per-row d² work happens in place, never as d² shuffle rows. */
final class OuterProductBuffer(var dy: Int, var dx: Int,
                               var sums: Array[JBigDecimal]) {
  def isEmpty: Boolean = dy < 0
}

/** `Σ_rows y·xᵀ` as ONE aggregate buffer — the outer-product moment
  * matrix (`array<array<double>>`, row i = Σ y_i·x_j over j) that
  * OPQ's Procrustes step and the eigenvalue-allocation covariance
  * consume. Replaces the posexplode × transform formulation, which
  * materializes corpus × d² rows into a (i,j)-keyed Exchange before
  * aggregating — 4,096× per vector at d = 64, 10⁶× at d = 1000 —
  * with the AdcSum discipline applied to aggregation: one d×d buffer
  * per partition, exact arithmetic inside, a single buffer-sized
  * merge at the end.
  *
  * Numeric contract — BIT-IDENTICAL to the exploded decimal
  * aggregate it replaces (spec-pinned): each per-row term is
  * `BigDecimal.valueOf(y_i · x_j).setScale(18, HALF_UP)` — exactly
  * Spark's `CAST(double AS DECIMAL(38,18))` — and accumulation is
  * exact decimal addition, so the sum is order-independent under any
  * partitioning and the final `.doubleValue` agrees with the old
  * path's `CAST(sum AS DOUBLE)` bit for bit. (The one divergence is
  * deliberate: an exact sum cannot overflow, where the decimal(38)
  * column would null past 10²⁰ — a magnitude no embedding moment
  * reaches.)
  *
  * Null semantics mirror the exploded form: a null y or x vector
  * contributes nothing (posexplode of null emitted no rows); a null
  * ELEMENT skips exactly its (i, j) cells (the null product was
  * ignored by SUM). Ragged inputs were silently misaligned by the
  * old path; here they fail loudly.
  */
case class OuterProductSum(left: Expression, right: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[OuterProductBuffer] {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(ArrayType(DoubleType))
  override def prettyName: String = "outer_product_sum"

  override def createAggregationBuffer(): OuterProductBuffer =
    new OuterProductBuffer(-1, -1, null)

  override def update(buf: OuterProductBuffer, input: InternalRow)
      : OuterProductBuffer = {
    val y = left.eval(input)
    val x = right.eval(input)
    if (y == null || x == null) return buf
    val ya = y.asInstanceOf[ArrayData]
    val xa = x.asInstanceOf[ArrayData]
    if (buf.isEmpty) {
      buf.dy = ya.numElements()
      buf.dx = xa.numElements()
      buf.sums = Array.fill(buf.dy * buf.dx)(JBigDecimal.ZERO)
    }
    require(ya.numElements() == buf.dy && xa.numElements() == buf.dx,
      s"outer_product_sum: ragged input (${ya.numElements()}×" +
        s"${xa.numElements()} row in a ${buf.dy}×${buf.dx} aggregate)")
    var i = 0
    while (i < buf.dy) {
      if (!ya.isNullAt(i)) {
        val yi = ya.getDouble(i)
        var j = 0
        while (j < buf.dx) {
          if (!xa.isNullAt(j)) {
            val term = JBigDecimal.valueOf(yi * xa.getDouble(j))
              .setScale(18, RoundingMode.HALF_UP)
            val k = i * buf.dx + j
            buf.sums(k) = buf.sums(k).add(term)
          }
          j += 1
        }
      }
      i += 1
    }
    buf
  }

  override def merge(buf: OuterProductBuffer, other: OuterProductBuffer)
      : OuterProductBuffer = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) {
      buf.dy = other.dy; buf.dx = other.dx
      buf.sums = other.sums.clone()
      return buf
    }
    require(buf.dy == other.dy && buf.dx == other.dx,
      s"outer_product_sum: merging ${buf.dy}×${buf.dx} with " +
        s"${other.dy}×${other.dx}")
    var k = 0
    while (k < buf.sums.length) {
      buf.sums(k) = buf.sums(k).add(other.sums(k))
      k += 1
    }
    buf
  }

  override def eval(buf: OuterProductBuffer): Any = {
    if (buf.isEmpty) return null
    new GenericArrayData(Array.tabulate(buf.dy) { i =>
      new GenericArrayData(Array.tabulate(buf.dx) { j =>
        buf.sums(i * buf.dx + j).doubleValue()
      })
    })
  }

  override def serialize(buf: OuterProductBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dy)
    out.writeInt(buf.dx)
    if (!buf.isEmpty) buf.sums.foreach { s =>
      val unscaled = s.unscaledValue().toByteArray
      out.writeInt(s.scale())
      out.writeInt(unscaled.length)
      out.write(unscaled)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): OuterProductBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dy = in.readInt()
    val dx = in.readInt()
    if (dy < 0) return new OuterProductBuffer(-1, -1, null)
    val sums = Array.tabulate(dy * dx) { _ =>
      val scale = in.readInt()
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      new JBigDecimal(new java.math.BigInteger(b), scale)
    }
    new OuterProductBuffer(dy, dx, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OuterProductSum =
    copy(left = newChildren(0), right = newChildren(1))
}

object MomentAggregates {
  import org.apache.spark.sql.graft.ColumnBridge

  /** `Σ_rows y·xᵀ` as a Column aggregate (see [[OuterProductSum]]);
    * both sides must be `array<double>` of fixed per-column length. */
  def outerProductSum(y: Column, x: Column): Column =
    ColumnBridge.column(OuterProductSum(ColumnBridge.expression(y),
      ColumnBridge.expression(x)).toAggregateExpression())
}
