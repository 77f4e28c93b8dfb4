package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k as a real aggregate (TypedImperativeAggregate), the
  * scale path SURVEY §5 plans for per-group rankings: a window over
  * `partitionBy(group)` sorts every row through |groups| reducers,
  * and even the two-phase window (operators.TopK) sorts each
  * partition locally. This aggregate keeps a k-bounded buffer per
  * group *map-side*, so only k rows per (group, input partition) ever
  * shuffle and nothing is globally sorted.
  *
  * Ordering: score DESC, id ASC (the deterministic tie-break every
  * graft ranking uses). Output: array<struct<score, id>> in rank
  * order — `posexplode` turns it into ranked rows.
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedPairs
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(off: Int): TopKPairs =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKPairs =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

/** k-bounded buffer: a simple (score asc, id desc)-ordered min-heap
  * array; the root is the weakest held pair, replaced when a stronger
  * one arrives. Comparisons mirror (score DESC, id ASC) ranking.
  */
final class TopKBuffer(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** true if (s1, i1) ranks strictly better than (s2, i2).
    * `Double.compare` gives the same *total* order Spark's window
    * sort uses (NaN above +Inf, -0.0 below 0.0) — a plain `>` would
    * let one NaN score sit at the heap root and reject every later
    * insertion. */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long) = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(s: Double, i: Long): Unit =
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1
      if (n == k) heapify()
    } else if (better(s, i, scores(0), ids(0))) {
      scores(0) = s; ids(0) = i; siftDown(0)
    }

  private def heapify(): Unit = {
    var i = n / 2 - 1
    while (i >= 0) { siftDown(i); i -= 1 }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val (l, r) = (2 * i + 1, 2 * i + 2)
      var w = i // weakest of i and children sits at the root
      if (l < n && better(scores(w), ids(w), scores(l), ids(l))) w = l
      if (r < n && better(scores(w), ids(w), scores(r), ids(r))) w = r
      if (w == i) return
      val (ts, ti) = (scores(i), ids(i))
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = ts; ids(w) = ti
      i = w
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** pairs in final rank order (score DESC, id ASC). */
  def sortedPairs: Array[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < m) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

object TopKAggregate {
  /** top-k (score DESC, id ASC) pairs per group as one aggregate:
    * `groupBy(g).agg(topkPairs(score, id, k))`. */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairs(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}
