package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused hashing expressions for the dedup pipeline.
  *
  * The declarative forms (`transform(toks, t => xxhash64(t))`, per-seed
  * `array_min(transform(...))`, 64 unrolled bit votes) run interpreted
  * lambda calls per element — tens of thousands per row. These
  * expressions collapse each chain into one JITed loop via `doGenCode`,
  * built from the same primitives Spark's `xxhash64` uses
  * (`XXH64.hashUTF8String` / `hashLong`, seed 42, left-to-right folds).
  *
  * Hash-space note: a shingle hash is the fold over the *token
  * hashes*, i.e. for n = 1 it is `hashLong(hashUTF8String(tok, 42),
  * 42)` — deliberately one fold step over the per-token hash, which is
  * NOT numerically equal to SQL `xxhash64(tok)`. All graft consumers
  * (jaccard index, minhash, simhash) live in this one hash space; do
  * not join these values against externally-computed `xxhash64`.
  *
  * All three assume null-free array inputs (they consume outputs of
  * `split`/each other, which never produce null elements).
  */
object HashExpressions {
  private[plans] final val Seed = 42L

  /** array<string> tokens → array<long> hashes of every `n`-token
    * shingle (fold of the n token hashes — see the hash-space note
    * above); fewer than `n` tokens yields the single sentinel hash
    * 0L. `n = 1` is the per-token variant. */
  def hashedShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(tokens), n))

  /** array<long> shingle hashes → length-`k` MinHash signature
    * (position s = min over shingles of `xxhash64(s, shingle)`). */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingleHashes), k))

  /** array<long> token hashes → 64-bit SimHash (per-bit majority). */
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  /** array<string> tokens → [[SimHashBitsSeeded.Bits]]-char '0'/'1'
    * seeded-SimHash bit string
    * (md5-based, oracle-reproducible — see [[SimHashBitsSeeded]]). */
  def simhashBitsSeeded(tokens: Column): Column =
    ColumnBridge.column(SimHashBitsSeeded(ColumnBridge.expression(tokens)))

  /** Positions where two array<long> signatures agree — the fused
    * MinHash verify (see [[SigAgreeCount]]). */
  def sigAgree(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreeCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val nTok = a.numElements()
    if (nTok < n) return new GenericArrayData(Array(0L))
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      th(i) = XXH64.hashUTF8String(a.getUTF8String(i), HashExpressions.Seed)
      i += 1
    }
    val out = new Array[Long](nTok - n + 1)
    i = 0
    while (i < out.length) {
      var acc = HashExpressions.Seed
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    nullSafeCodeGen(ctx, ev, a => {
      val nTok = ctx.freshName("nTok")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $nTok = $a.numElements();
         |long[] $out;
         |if ($nTok < $n) { $out = new long[]{0L}; } else {
         |  long[] $th = new long[$nTok];
         |  for (int $i = 0; $i < $nTok; $i++) {
         |    $th[$i] = $xxh.hashUTF8String($a.getUTF8String($i), ${HashExpressions.Seed}L);
         |  }
         |  $out = new long[$nTok - $n + 1];
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    long $acc = ${HashExpressions.Seed}L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc = $xxh.hashLong($th[$i + $j], $acc);
         |    }
         |    $out[$i] = $acc;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** Number of positions where two `array<long>` signatures agree — the
  * MinHash verify step, fused. The declarative form
  * `size(filter(zip_with(a, b, (x,y) => ...), v => ...))` runs TWO
  * interpreted higher-order lambdas per candidate pair (`ZipWith` and
  * `ArrayFilter` are CodegenFallback) and allocates two intermediate
  * arrays; this is the hot loop of every LSH query once banding has
  * done its job — candidates ≫ docs on template-heavy corpora. One
  * codegen'd walk, no allocation. Arrays shorter than the other's
  * length compare positionally over the common prefix (signatures are
  * fixed-width by construction; the guard is for direct SQL use).
  */
case class SigAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_agree_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint> inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreeCount =
    copy(left = newLeft, right = newRight)
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "need at least one hash")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  /** Seed chain of the declarative `xxhash64(lit(s), shingleHash)`:
    * the int literal folds first, then the shingle hash. */
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(s => XXH64.hashInt(s, HashExpressions.Seed))

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val g = a.getLong(i)
      var s = 0
      while (s < k) {
        val v = XXH64.hashLong(g, seeds(s))
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val g = ctx.freshName("g")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $g = $a.getLong($i);
         |  for (int $s = 0; $s < $k; $s++) {
         |    long $v = $xxh.hashLong($g, $seedsRef[$s]);
         |    if ($v < $mins[$s]) $mins[$s] = $v;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** The md5-seeded 60-bit SimHash vote loop, fused: token value =
  * first 15 md5 hex chars big-endian (bit-identical to SQL
  * `conv(substring(md5(t), 1, 15), 16, 10)` / DuckDB
  * `CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)` — 60 bits, chosen
  * to fit SIGNED 64-bit in both engines), bit j of the output string
  * (LSB-first) set when ones ≥ zeros. 60 bits rather than 32: with 4
  * bands the band key is 15 bits, so bucket sizes stay selective —
  * 8-bit bands (256 buckets) made the candidate self-join the
  * dominant cost. The declarative form (staged array + per-bit
  * `aggregate` lambdas) pays an interpreted lambda call per (bit,
  * token) — tens of millions of invocations / 37 s at sf0.1; one
  * fused loop per row is the same r2 lesson the xxhash64 family
  * learned (HashedShingles/MinHashSig/SimHash64). Only the
  * IMPLEMENTATION is fused — the VALUES stay SQL-reproducible, which
  * is the entire point of the seeded path.
  */
case class SimHashBitsSeeded(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "simhash_bits_seeded"

  override def nullSafeEval(input: Any): Any =
    SimHashBitsSeeded.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.plans.SimHashBitsSeeded$$.MODULE$$.compute($a);""")

  override protected def withNewChildInternal(newChild: Expression): SimHashBitsSeeded =
    copy(child = newChild)
}

object SimHashBitsSeeded {
  final val Bits = 60

  /** One MD5 instance per JVM thread (MessageDigest is stateful). */
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(a: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = a.numElements()
    val counts = new Array[Int](Bits)
    val digest = md.get()
    var i = 0
    while (i < n) {
      digest.reset()
      val h = digest.digest(a.getUTF8String(i).getBytes)
      // first 15 hex chars = first 8 bytes big-endian >>> 4
      // == conv(substring(hex, 1, 15), 16, 10)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      v >>>= 4
      var j = 0
      while (j < Bits) { counts(j) += ((v >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    val out = new Array[Char](Bits)
    var j = 0
    while (j < Bits) {
      out(j) = if (counts(j) * 2 >= n) '1' else '0'
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(out))
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) r |= (1L << b)
      b += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] * 2 > $n) $r |= (1L << $b);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
