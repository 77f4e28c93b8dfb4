package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Hyperplane-family expressions that bind the WHOLE plane matrix
  * once per plan node.
  *
  * The declarative forms (`array(dotConst(vec, p0), dotConst(vec,
  * p1), …)`) embed every plane as `dim` literal children, and each
  * use site (per band, per join side, per margin term) repeats the
  * whole family — plan and codegen size grow O(bands × planes × dim)
  * and at the wide Gaussian rungs ((4×20)/(3×24), 80 × 64 doubles)
  * risk the 64 KB generated-method ceiling, which Spark "handles" by
  * silently falling back to interpreted projection. These
  * expressions instead carry the matrix as a constructor parameter,
  * shipped to executors as ONE codegen reference object
  * (`ctx.addReferenceObj`): the generated code is a fixed-size loop
  * over `double[][]` no matter how many planes, and the plan string
  * shows the family's shape, never its coefficients.
  *
  * Semantics are bit-for-bit the declarative forms' (spec-asserted):
  * each dot is the strict ascending left fold from +0.0 with floats
  * promoted to double before the multiply, a null element or a
  * length-mismatched vector nulls that plane's dot, and the sign
  * test treats NaN like Spark's `>=` does (NaN sorts above every
  * real, so its bit is SET).
  */
private[graft] trait PlaneFamilyExpression extends UnaryExpression {
  def planes: Seq[Seq[Double]]

  @transient protected lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  protected def vecElemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs an array<float|double> vector, " +
            s"got ${other.simpleString}")
    }

  /** Dot of `vec` against plane `p`, or null (boxed) on length
    * mismatch / null element — the exact `vec_dot` fold. */
  protected def dotPlane(vec: ArrayData, pl: Array[Double]): java.lang.Double = {
    if (vec.numElements() != pl.length) return null
    val isFloat = vecElemIsFloat
    var sum = 0.0
    var i = 0
    while (i < pl.length) {
      if (vec.isNullAt(i)) return null
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      sum += x * pl(i)
      i += 1
    }
    sum
  }

  /** The matrix never prints its coefficients — a (planes × dim)
    * shape tag keeps explain output constant-size. */
  protected def shapeTag: String =
    s"${planes.size}x${planes.headOption.map(_.size).getOrElse(0)}"
}

/** All `planes.size / bitsPerBand` LSH band ids of one vector in a
  * single pass: element `b` packs the sign bits of planes
  * `[b·bitsPerBand, (b+1)·bitsPerBand)`, bit `i` set iff
  * `dot(vec, plane) >= 0` (Spark semantics: a NaN dot sets the bit;
  * a null dot — null element / length mismatch — leaves it 0).
  * A null vector yields all-zero bands, never null, mirroring the
  * `when(dot >= 0, bit).otherwise(0)` fold it replaces. With
  * `bitsPerBand = planes.size` the single element is the classic
  * packed bucket id ([[graft.operators.Similarity.bucketBits]]).
  */
case class SignBands(child: Expression, planes: Seq[Seq[Double]],
                     bitsPerBand: Int)
    extends PlaneFamilyExpression {
  require(planes.nonEmpty && planes.size % bitsPerBand == 0,
    "bands must tile the planes")
  require(bitsPerBand >= 1 && bitsPerBand <= 64,
    "a band's bits must fit in a long")

  private def nBands: Int = planes.size / bitsPerBand

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sign_bands"
  override def toString: String =
    s"sign_bands($child, planes=$shapeTag, bits=$bitsPerBand)"
  override def sql: String =
    s"sign_bands(${child.sql}, planes=$shapeTag, bits=$bitsPerBand)"

  override def eval(input: InternalRow): Any = {
    val bands = new Array[Long](nBands)
    val v = child.eval(input)
    if (v != null) {
      val vec = v.asInstanceOf[ArrayData]
      var p = 0
      while (p < matrix.length) {
        val d = dotPlane(vec, matrix(p))
        // NaN >= 0 is TRUE under Spark's ordering (NaN above all reals)
        if (d != null && (java.lang.Double.isNaN(d) || d >= 0.0))
          bands(p / bitsPerBand) |= 1L << (p % bitsPerBand)
        p += 1
      }
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", matrix, "double[][]")
    val get =
      if (vecElemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val bands = ctx.freshName("bands")
    val vec = ctx.freshName("vec")
    val p = ctx.freshName("p")
    val pl = ctx.freshName("pl")
    val s = ctx.freshName("s")
    val miss = ctx.freshName("miss")
    val i = ctx.freshName("i")
    val code =
      code"""
         |${childGen.code}
         |long[] $bands = new long[$nBands];
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $vec = ${childGen.value};
         |  for (int $p = 0; $p < $planesRef.length; $p++) {
         |    double[] $pl = $planesRef[$p];
         |    if ($vec.numElements() == $pl.length) {
         |      double $s = 0.0;
         |      boolean $miss = false;
         |      for (int $i = 0; $i < $pl.length; $i++) {
         |        if ($vec.isNullAt($i)) { $miss = true; break; }
         |        $s += ${get(vec, i)} * $pl[$i];
         |      }
         |      if (!$miss && (Double.isNaN($s) || $s >= 0.0))
         |        $bands[$p / $bitsPerBand] |= 1L << ($p % $bitsPerBand);
         |    }
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

/** All plane dots of one vector — `array(dot(vec, p0), dot(vec, p1),
  * …)` with the matrix bound once. Element `p` is null exactly when
  * the declarative per-plane `vec_dot` is (null vector, null element,
  * length mismatch); the array itself is never null. Feeds the
  * multi-probe margin ordering, where each plane's SIGNED distance is
  * needed, not just its sign bit. */
case class PlaneDots(child: Expression, planes: Seq[Seq[Double]])
    extends PlaneFamilyExpression {
  require(planes.nonEmpty, "at least one plane")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "plane_dots"
  override def toString: String = s"plane_dots($child, planes=$shapeTag)"
  override def sql: String = s"plane_dots(${child.sql}, planes=$shapeTag)"

  override def eval(input: InternalRow): Any = {
    val out = new Array[Any](matrix.length)
    val v = child.eval(input)
    if (v != null) {
      val vec = v.asInstanceOf[ArrayData]
      var p = 0
      while (p < matrix.length) {
        val d = dotPlane(vec, matrix(p))
        if (d != null) out(p) = d.doubleValue()
        p += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", matrix, "double[][]")
    val get =
      if (vecElemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val dots = ctx.freshName("dots")
    val vec = ctx.freshName("vec")
    val p = ctx.freshName("p")
    val pl = ctx.freshName("pl")
    val s = ctx.freshName("s")
    val miss = ctx.freshName("miss")
    val i = ctx.freshName("i")
    val code =
      code"""
         |${childGen.code}
         |Object[] $dots = new Object[${matrix.length}];
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $vec = ${childGen.value};
         |  for (int $p = 0; $p < $planesRef.length; $p++) {
         |    double[] $pl = $planesRef[$p];
         |    if ($vec.numElements() == $pl.length) {
         |      double $s = 0.0;
         |      boolean $miss = false;
         |      for (int $i = 0; $i < $pl.length; $i++) {
         |        if ($vec.isNullAt($i)) { $miss = true; break; }
         |        $s += ${get(vec, i)} * $pl[$i];
         |      }
         |      if (!$miss) $dots[$p] = (Object) Double.valueOf($s);
         |    }
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($dots);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDots =
    copy(child = newChild)
}

/** The IVF assignment kernel, fused: the INDEX of the centroid
  * maximizing `cos(v, c_i) = dot(v, c_i) / (|v| · cn_i)`, ties to
  * the larger centroid id — one int per vector.
  *
  * Why an expression: the declarative assignment crossJoins every
  * vector against the broadcast centroid frame (corpus ×
  * numCentroids rows — 22M at sf1's 350k × 64) and re-aggregates
  * with a `max_by` shuffle; this kernel is the whole E-step in one
  * zero-Exchange scan (the [[graft.plans.PqCodes]] discipline
  * applied to coarse assignment). Centroid matrix, norms, and ids
  * ride as codegen reference objects.
  *
  * Parity contract (spec-pinned against the max_by form): dots are
  * the exact `vec_dot` fold; `|v|` is `sqrt(vec_dot(v, v))` computed
  * once per row; `s = dot / (|v| · cn_i)` with the same operation
  * order; comparison is SQL double ordering over `struct(s, id)` —
  * a null dot (length mismatch / null element / null vector) sorts
  * below every real s, NaN above, −0.0 == 0.0, and equal s resolves
  * to the larger centroid ID (not index). All-null margins therefore
  * return the largest id's index, exactly as `max_by` over
  * `struct(null, id)` rows does. */
case class CosineArgmax(child: Expression, ids: Seq[Long],
                        planes: Seq[Seq[Double]], norms: Seq[Double])
    extends PlaneFamilyExpression {
  require(planes.nonEmpty && ids.length == planes.length &&
    norms.length == planes.length,
    "ids, centroid vectors, and norms must align")

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val cnArr: Array[Double] = norms.toArray

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "cosine_argmax"
  override def toString: String =
    s"cosine_argmax($child, cents=$shapeTag)"
  override def sql: String =
    s"cosine_argmax(${child.sql}, cents=$shapeTag)"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val va = if (v == null) null else v.asInstanceOf[ArrayData]
    // |v| once per row: the exact l2Norm fold; null vector or null
    // element -> null norm -> every margin null
    var vn = 0.0
    var vnNull = va == null
    if (!vnNull) {
      val isFloat = vecElemIsFloat
      var i = 0
      var sum = 0.0
      while (i < va.numElements() && !vnNull) {
        if (va.isNullAt(i)) vnNull = true
        else {
          val x = if (isFloat) va.getFloat(i).toDouble else va.getDouble(i)
          sum += x * x
        }
        i += 1
      }
      if (!vnNull) vn = math.sqrt(sum)
    }
    var best = 0
    var bestS = 0.0
    var bestNull = true
    var first = true
    var c = 0
    while (c < matrix.length) {
      val dot = if (vnNull) null else dotPlane(va, matrix(c))
      val sNull = dot == null
      val s = if (sNull) 0.0 else dot.doubleValue() / (vn * cnArr(c))
      val take =
        if (first) true
        else if (sNull) bestNull && idArr(c) > idArr(best)
        else bestNull || sqlGt(s, bestS) ||
          (sqlEq(s, bestS) && idArr(c) > idArr(best))
      if (take) { best = c; bestS = s; bestNull = sNull; first = false }
      c += 1
    }
    best
  }

  private def sqlGt(a: Double, b: Double): Boolean =
    if (a > b) true
    else if (a < b || a == b) false
    else java.lang.Double.compare(a, b) > 0 // NaN greatest
  private def sqlEq(a: Double, b: Double): Boolean =
    a == b || (a != a && b != b) // -0.0 == 0.0; NaN == NaN for order

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val childGen = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("cents", matrix, "double[][]")
    val cnRef = ctx.addReferenceObj("cns", cnArr, "double[]")
    val idRef = ctx.addReferenceObj("cids", idArr, "long[]")
    val get =
      if (vecElemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val va = ctx.freshName("va")
    val vn = ctx.freshName("vn")
    val vnNull = ctx.freshName("vnNull")
    val sum = ctx.freshName("sum")
    val i = ctx.freshName("i")
    val best = ctx.freshName("best")
    val bestS = ctx.freshName("bestS")
    val bestNull = ctx.freshName("bestNull")
    val first = ctx.freshName("first")
    val c = ctx.freshName("c")
    val pl = ctx.freshName("pl")
    val dot = ctx.freshName("dot")
    val sNull = ctx.freshName("sNull")
    val s = ctx.freshName("s")
    val take = ctx.freshName("take")
    val gt = ctx.freshName("gt")
    val eq = ctx.freshName("eq")
    val code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData $va =
         |  ${childGen.isNull} ? null : ${childGen.value};
         |double $vn = 0.0;
         |boolean $vnNull = $va == null;
         |if (!$vnNull) {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $va.numElements() && !$vnNull; $i++) {
         |    if ($va.isNullAt($i)) { $vnNull = true; }
         |    else { double x = ${get(va, i)}; $sum += x * x; }
         |  }
         |  if (!$vnNull) $vn = Math.sqrt($sum);
         |}
         |int $best = 0;
         |double $bestS = 0.0;
         |boolean $bestNull = true;
         |boolean $first = true;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $pl = $centsRef[$c];
         |  boolean $sNull = $vnNull || $va.numElements() != $pl.length;
         |  double $dot = 0.0;
         |  if (!$sNull) {
         |    for (int $i = 0; $i < $pl.length && !$sNull; $i++) {
         |      if ($va.isNullAt($i)) { $sNull = true; }
         |      else { $dot += ${get(va, i)} * $pl[$i]; }
         |    }
         |  }
         |  double $s = $sNull ? 0.0 : $dot / ($vn * $cnRef[$c]);
         |  boolean $take;
         |  if ($first) { $take = true; }
         |  else if ($sNull) {
         |    $take = $bestNull && $idRef[$c] > $idRef[$best];
         |  } else {
         |    boolean $gt = ($s > $bestS) ||
         |      (Double.isNaN($s) && !Double.isNaN($bestS));
         |    boolean $eq = ($s == $bestS) ||
         |      (Double.isNaN($s) && Double.isNaN($bestS));
         |    $take = $bestNull || $gt ||
         |      ($eq && $idRef[$c] > $idRef[$best]);
         |  }
         |  if ($take) { $best = $c; $bestS = $s; $bestNull = $sNull;
         |    $first = false; }
         |}
         |int ${ev.value} = $best;
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CosineArgmax = copy(child = newChild)
}

object PlaneExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** All band ids of a vector (array<long>, one element per band). */
  def signBands(vec: Column, planes: Seq[Seq[Double]], bitsPerBand: Int): Column =
    ColumnBridge.column(
      SignBands(ColumnBridge.expression(vec), planes, bitsPerBand))

  /** All plane dots of a vector (array<double>, null per missing dot). */
  def planeDots(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PlaneDots(ColumnBridge.expression(vec), planes))

  /** Index of the max-cosine centroid (int; see [[CosineArgmax]]). */
  def cosineArgmax(vec: Column, ids: Seq[Long],
                   cents: Seq[Seq[Double]], norms: Seq[Double]): Column =
    ColumnBridge.column(
      CosineArgmax(ColumnBridge.expression(vec), ids, cents, norms))
}
