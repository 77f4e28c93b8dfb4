package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a first-class plan primitive — the
  * scale path for "is this key in that OTHER corpus?" when the other
  * corpus's exact key set is too large to broadcast: the sketch is
  * O(n·ln(1/fpp)) BITS (~1.2 MB per million keys at 1% fpp, ~13×
  * smaller than the exact 8-byte-hash array), membership is O(k)
  * probes with NO join in the plan at all, and the only error mode is
  * a false POSITIVE — each caller must want that direction (for
  * decontamination it errs toward dropping more, the safe side).
  *
  * The filter is built by a real distributed aggregate (map-side
  * partial filters OR-merged in one reduce) and the one-row sketch is
  * then broadcast — the same build-small-broadcast-probe shape Spark's
  * own runtime row-group filtering uses, expressed as a library
  * operator.
  */
object BloomFilters {

  /** Build a filter over a LONG column with one distributed aggregate
    * (partials merge by bitwise OR). `expectedItems` sizes the bit
    * array for the target `fpp`; overshooting wastes bits, undershooting
    * raises the realized fpp — pass the (cheap) distinct count of the
    * small side. The returned sketch lives on the driver (it is the
    * one-row RESULT of the aggregate, O(MB) by construction — the data
    * itself never leaves the executors). */
  def buildLong(df: DataFrame, value: Column,
                expectedItems: Long, fpp: Double): BloomFilter = {
    require(expectedItems >= 1, "expectedItems must be >= 1")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val agg = ColumnBridge.column(
      BloomBuildLong(ColumnBridge.expression(value), expectedItems, fpp)
        .toAggregateExpression())
    val bytes = df.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Membership probe against a broadcast filter — codegen'd, no join.
    * Executors fetch the sketch once via the broadcast; per row is k
    * hash probes. */
  def mightContainLong(bc: Broadcast[BloomFilter], value: Column): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(value), bc))

  /** How many elements of an `array<long>` the filter (might) contain —
    * the PER-ROW rollup shape: one expression replaces
    * explode → probe → doc-keyed re-aggregate, which makes the whole
    * overlap computation a stateless projection (and therefore legal
    * on an unaggregated STREAM in Append mode). */
  def countContainedLong(bc: Broadcast[BloomFilter], arr: Column): Column =
    ColumnBridge.column(
      BloomCountContainedLong(ColumnBridge.expression(arr), bc))
}

/** Distributed Bloom build over longs: each partition fills a local
  * filter, partials OR-merge (BloomFilter.mergeInPlace), eval emits
  * the serialized sketch as binary. */
case class BloomBuildLong(child: Expression, expectedItems: Long, fpp: Double,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build_long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(off: Int): BloomBuildLong =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomBuildLong =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildLong =
    copy(child = newChildren(0))
}

/** `bc.value.mightContainLong(child)` — the broadcast handle rides the
  * expression (it serializes as a small stub; executors fetch the
  * sketch blocks once and `.value` caches per executor), so the probe
  * is a pure projection: no bloom bytes ever travel through rows, no
  * per-row deserialization, no join. */
case class BloomMightContainLong(child: Expression, bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${child.dataType.simpleString}")

  def contains(v: Long): Boolean = bc.value.mightContainLong(v)

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.contains($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** Count of `array<long>` elements the broadcast filter might contain
  * (null elements skipped). See [[BloomFilters.countContainedLong]]. */
case class BloomCountContainedLong(child: Expression,
                                   bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_count_contained_long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<bigint>, got ${other.simpleString}")
    }

  def countContained(a: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val f = bc.value
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && f.mightContainLong(a.getLong(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    countContained(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCount", this,
      classOf[BloomCountContainedLong].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.countContained($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomCountContainedLong =
    copy(child = newChild)
}
